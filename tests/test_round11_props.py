"""Round-11 nets, part 1 — the r10 ADVICE name-safety holes on the
versioned layer: MERGE/commit_existing_dir schema evolution now run
the same dropped-column resurrection + physical-name-clash guard as
the append path (`_guard_revived_names`), delete_where refuses
NULL-keyed matches (an invisible UNDER-delete otherwise), and
rename_column's sidecar move routes by generation suffix so renaming
a column literally named ``text_x`` cannot detach column x's token
family.

Reference parity anchors cited per test; everything here exercises
the Spark-native versioned layer (`operators/versioned.py`), not a
translation of the reference's per-row SQL loop
(/root/reference/src/main_01.py:255-305).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    add_column,
    drop_column,
    merge_version,
    read_version,
    rename_column,
    write_version,
)


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_merge_evolution_refuses_resurrection(spark, tmp_path):
    """merge_version(merge_schema=True) with a source still carrying
    a previously DROPPED column refuses (r10 ADVICE high): without
    the guard the drifting source evolves the name back in and the
    untouched old files' orphaned physical bytes reappear on every
    read. add_column remains the sanctioned re-add (fresh physical
    name)."""
    tdir = str(tmp_path / "mergeres")
    write_version(
        _mk(spark, [(1, "a", 10), (2, "b", 20)], "k int, s string, v int"),
        tdir,
        "append",
    )
    drop_column(spark, tdir, "s")
    src = _mk(spark, [(1, "GHOST", 11)], "k int, s string, v int")
    with pytest.raises(ValueError, match="DROPPED.*resurrect"):
        merge_version(spark, tdir, src, key="k", merge_schema=True)
    # dropping the drifted column from the source merges fine
    merge_version(
        spark, tdir, src.drop("s"), key="k", merge_schema=True
    )
    got = read_version(spark, tdir).orderBy("k").collect()
    assert [tuple(r) for r in got] == [(1, 11), (2, 20)]
    # and add_column's fresh physical name keeps history NULL
    add_column(spark, tdir, "s", "string")
    got = read_version(spark, tdir).orderBy("k").collect()
    assert [tuple(r) for r in got] == [(1, 11, None), (2, 20, None)]


def test_merge_evolution_refuses_physical_name_clash(spark, tmp_path):
    """merge_schema=True may not evolve in a column whose name equals
    a RENAMED column's physical name (r10 ADVICE high): two logical
    columns cannot share one on-disk name, and the append path
    already refuses this loudly — MERGE now matches instead of dying
    inside the parquet writer."""
    tdir = str(tmp_path / "mergeclash")
    write_version(
        _mk(spark, [(1, 10), (2, 20)], "k int, a int"), tdir, "append"
    )
    rename_column(spark, tdir, "a", "b")  # physical name 'a' is taken
    src = _mk(spark, [(1, 11, 99)], "k int, b int, a int")
    with pytest.raises(ValueError, match="PHYSICAL"):
        merge_version(spark, tdir, src, key="k", merge_schema=True)


def test_commit_existing_dir_refuses_resurrection(spark, tmp_path):
    """commit_existing_dir's guard covers drop-ONLY tables (r10
    ADVICE medium): a table that only dropped a column has an EMPTY
    column_map but non-empty dropped_physicals, and an external dir
    re-introducing the dropped name under merge_schema=True used to
    evolve it back in."""
    from tms_etl_spark.operators.versioned import commit_existing_dir

    tdir = str(tmp_path / "cedres")
    write_version(
        _mk(spark, [(1, "x", 1.0)], "k int, s string, v double"),
        tdir,
        "append",
    )
    drop_column(spark, tdir, "s")
    ext = _mk(spark, [(2, "GHOST", 2.0)], "k int, s string, v double")
    ext.write.parquet(f"{tdir}/ext-0001")
    with pytest.raises(ValueError, match="DROPPED.*resurrect"):
        commit_existing_dir(
            spark, tdir, "ext-0001", "append", merge_schema=True
        )
    # a clean dir (no drifted column) still commits
    _mk(spark, [(3, 3.0)], "k int, v double").write.parquet(
        f"{tdir}/ext-0002"
    )
    commit_existing_dir(spark, tdir, "ext-0002", "append")
    got = read_version(spark, tdir).orderBy("k").collect()
    assert [tuple(r) for r in got] == [(1, 1.0), (3, 3.0)]


def test_delete_where_refuses_null_keys(spark, tmp_path):
    """delete_where with NULL-keyed matched rows refuses — with and
    without allow_key_scope (r10 ADVICE medium): a NULL key never
    equals, so the tombstone anti-join silently KEEPS those rows — an
    under-delete in the GDPR verb that previously surfaced only as a
    negative 'over-delete' count. Non-matching NULL rows stay
    deletable by other keys."""
    from tms_etl_spark.operators.versioned import delete_where

    tdir = str(tmp_path / "delnull")
    write_version(
        _mk(
            spark,
            [(1, "err", 1.0), (None, "err", 2.0), (3, "ok", 3.0)],
            "k int, status string, v double",
        ),
        tdir,
        "append",
    )
    with pytest.raises(ValueError, match="NULL"):
        delete_where(spark, tdir, "status = 'err'", "k")
    with pytest.raises(ValueError, match="NULL"):
        delete_where(
            spark, tdir, "status = 'err'", "k", allow_key_scope=True
        )
    # a predicate whose matches are all non-NULL-keyed still works
    delete_where(spark, tdir, "status = 'err' AND k IS NOT NULL", "k")
    got = read_version(spark, tdir).orderBy(F.col("v")).collect()
    assert [r["v"] for r in got] == [2.0, 3.0]


def test_rename_moves_only_matching_index_generations(spark, tmp_path):
    """rename_column routes the sidecar move by generation suffix
    (r10 ADVICE low): with a Bloom family on a column literally named
    ``text_x`` AND a token family on column ``x`` — both living in
    ``_indexes/text_x`` — renaming ``text_x`` moves only the
    ``-bloom`` generations; x's ``-tokens`` stay attached and
    search_token keeps pruning."""
    import os

    from tms_etl_spark.operators.bloomindex import (
        build_bloom_index,
        read_version_point,
    )
    from tms_etl_spark.operators.textindex import (
        build_text_index,
        search_token,
    )

    tdir = str(tmp_path / "rensidecar")
    write_version(
        _mk(
            spark,
            [(i, f"alpha{i} beta{i % 3}") for i in range(20)],
            "text_x int, x string",
        ).coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "text_x")  # _indexes/text_x/v*-bloom
    build_text_index(spark, tdir, "x")  # _indexes/text_x/v*-tokens
    fam = os.path.join(tdir, "_indexes", "text_x")
    kinds = {g.split("-")[-1] for g in os.listdir(fam)}
    assert kinds == {"bloom", "tokens"}  # the mixed-family premise

    rename_column(spark, tdir, "text_x", "y")
    # token gens stayed; bloom gens moved to the new family dir
    assert {g.split("-")[-1] for g in os.listdir(fam)} == {"tokens"}
    newfam = os.path.join(tdir, "_indexes", "y")
    assert {g.split("-")[-1] for g in os.listdir(newfam)} == {"bloom"}
    got = search_token(spark, tdir, "x", "beta1")
    assert {r["y"] for r in got.collect()} == {1, 4, 7, 10, 13, 16, 19}
    got = read_version_point(spark, tdir, "y", 7)
    assert [r["x"] for r in got.collect()] == ["alpha7 beta1"]


def test_rename_token_family_moves_tokens_only(spark, tmp_path):
    """The inverse routing: renaming text column ``x`` (token family
    in ``_indexes/text_x``) moves the ``-tokens`` gens to
    ``_indexes/text_y`` and leaves a Bloom family on literal column
    ``text_x`` untouched."""
    import os

    from tms_etl_spark.operators.bloomindex import (
        build_bloom_index,
        read_version_point,
    )
    from tms_etl_spark.operators.textindex import (
        build_text_index,
        search_token,
    )

    tdir = str(tmp_path / "rentokens")
    write_version(
        _mk(
            spark,
            [(i, f"w{i} common") for i in range(10)],
            "text_x int, x string",
        ).coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "text_x")
    build_text_index(spark, tdir, "x")
    rename_column(spark, tdir, "x", "y")
    fam = os.path.join(tdir, "_indexes", "text_x")
    assert {g.split("-")[-1] for g in os.listdir(fam)} == {"bloom"}
    newfam = os.path.join(tdir, "_indexes", "text_y")
    assert {g.split("-")[-1] for g in os.listdir(newfam)} == {"tokens"}
    got = search_token(spark, tdir, "y", "w3")
    assert [r["text_x"] for r in got.collect()] == [3]
    got = read_version_point(spark, tdir, "text_x", 5)
    assert [r["y"] for r in got.collect()] == ["w5 common"]
