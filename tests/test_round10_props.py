"""Round-10 nets: MERGE schema evolution, snapshot pinning for the
WHERE front door, layout-routed index maintenance, and the manifest
regex width fix.

Reference parity anchors cited per test; everything here exercises
the Spark-native versioned layer (`operators/versioned.py`), not a
translation of the reference's per-row SQL loop
(/root/reference/src/main_01.py:255-305).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    merge_version,
    read_version,
    read_version_where,
    write_version,
)


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_merge_schema_evolution_adds_and_widens(spark, tmp_path):
    """merge_schema=True: one MERGE adds a column AND widens the key
    int→long; untouched files null-fill/upcast reader-side, the CoW
    survivors null-fill via the union, source rows land wide — and
    time travel to v1 still shows the ORIGINAL schema."""
    tdir = str(tmp_path / "mergeevo")
    write_version(
        _mk(
            spark,
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        ).coalesce(1),
        tdir,
        "append",
    )
    # second file the merge never touches: pure reader-side evolution
    write_version(
        _mk(spark, [(4, "d", 40.0)], "k int, s string, v double")
        .coalesce(1),
        tdir,
        "append",
    )
    src = _mk(
        spark,
        [(2, "B", 200.0, 7), (9, "Z", 900.0, 8)],
        "k long, s string, v double, extra long",
    )
    merge_version(spark, tdir, src, key="k", merge_schema=True)
    got = {
        r["k"]: (r["s"], r["v"], r["extra"])
        for r in read_version(spark, tdir).collect()
    }
    assert got == {
        1: ("a", 10.0, None),
        2: ("B", 200.0, 7),
        3: ("c", 30.0, None),
        4: ("d", 40.0, None),  # untouched file: null-fill at read
        9: ("Z", 900.0, 8),
    }
    out = read_version(spark, tdir)
    assert dict(out.dtypes)["k"] == "bigint"
    assert dict(out.dtypes)["extra"] == "bigint"
    # pre-evolution snapshot keeps the narrow, extra-less schema
    v2 = read_version(spark, tdir, version=2)
    assert dict(v2.dtypes)["k"] == "int"
    assert "extra" not in v2.columns


def test_merge_schema_evolution_refusals(spark, tmp_path):
    """Drifted source without merge_schema refuses loudly (even on
    the zero-touched-files insert path, which used to silently drop
    the new column at read time); a type CROSSING refuses even WITH
    merge_schema — same rules as append evolution."""
    tdir = str(tmp_path / "mergerefuse")
    write_version(
        _mk(spark, [(1, 10.0)], "k int, v double"), tdir, "append"
    )
    insert_only = _mk(
        spark, [(99, 1.0, "new")], "k int, v double, extra string"
    )
    with pytest.raises(ValueError, match="merge_schema"):
        merge_version(spark, tdir, insert_only, key="k")
    crossing = _mk(spark, [(1, "oops")], "k int, v string")
    with pytest.raises(ValueError, match="widening"):
        merge_version(spark, tdir, crossing, key="k", merge_schema=True)
    # narrower source batch is fine WITHOUT merge_schema: recorded
    # schema unchanged, batch upcasts reader-side
    write_version(
        _mk(spark, [(5, 5.0)], "k long, v double"), tdir, "overwrite"
    )
    merge_version(
        spark, tdir, _mk(spark, [(6, 6.0)], "k int, v double"), key="k"
    )
    assert dict(read_version(spark, tdir).dtypes)["k"] == "bigint"
    assert {
        r["k"] for r in read_version(spark, tdir).collect()
    } == {5, 6}


def test_where_snapshot_pinned_single_resolution(spark, tmp_path):
    """read_version_where resolves the snapshot ONCE (r10 ADVICE):
    with the version pinned up front, the DPP cut, the Bloom probe
    and the scan all see the same manifest — a commit landing after
    the pin is invisible to the read (verified by monkeypatching
    current_version to count calls and simulate a racing commit)."""
    import tms_etl_spark.operators.versioned as V

    tdir = str(tmp_path / "pinned")
    write_version(
        _mk(spark, [(1, "x", 10.0), (2, "y", 20.0)],
            "k int, s string, v double"),
        tdir,
        "append",
    )
    calls = {"n": 0}
    real = V.current_version

    def counting(spark_, dir_):
        calls["n"] += 1
        return real(spark_, dir_)

    try:
        V.current_version = counting
        df = read_version_where(
            spark, tdir, "k = 1 AND v > 0",
            prune_keys=("k", _mk(spark, [(1,)], "k int")),
        )
        rows = df.collect()
    finally:
        V.current_version = real
    assert [r["k"] for r in rows] == [1]
    # one pin + at most one validation inside _pruned_scan
    assert calls["n"] <= 2


def test_bloom_admitted_files_empty_values(spark, tmp_path):
    """`col IN ()` admits nothing: an empty probe list returns the
    empty set instead of raising a zero-element F.array() analysis
    error (r10 ADVICE)."""
    from tms_etl_spark.operators.bloomindex import (
        bloom_admitted_files,
        build_bloom_index,
    )
    from tms_etl_spark.operators.versioned import (
        _manifest_path,
        _read_json,
        current_version,
    )

    tdir = str(tmp_path / "bloomempty")
    write_version(
        _mk(spark, [(i,) for i in range(20)], "k int"), tdir, "append"
    )
    build_bloom_index(spark, tdir, "k")
    v = current_version(spark, tdir)
    man = _read_json(spark, _manifest_path(tdir, v))
    adm = bloom_admitted_files(spark, tdir, man, "k", [], v, "int")
    assert adm == set()


def test_maintain_routes_bloom_on_text_prefixed_column(spark, tmp_path):
    """A Bloom family on a column literally named ``text_x`` must NOT
    be misrouted to the text extender (r10 ADVICE): routing is by
    generation-dir suffix (-bloom vs -tokens), so the sidecar is
    extended and point reads stay index-assisted after maintenance."""
    from tms_etl_spark.operators.bloomindex import (
        build_bloom_index,
        read_version_point,
    )
    from tms_etl_spark.operators.versioned import maintain_table

    tdir = str(tmp_path / "textprefix")
    write_version(
        _mk(spark, [(i, i * 10) for i in range(30)],
            "text_x int, payload int").coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "text_x")
    write_version(
        _mk(spark, [(100, 1000)], "text_x int, payload int"),
        tdir,
        "append",
    )
    out = maintain_table(spark, tdir)
    assert out["extended_indexes"] == {"text_x:bloom": "extended"}
    got = read_version_point(spark, tdir, "text_x", 100)
    assert [r["payload"] for r in got.collect()] == [1000]


def test_manifest_listing_parses_wide_versions(tmp_path):
    """history/expire listing regexes accept any manifest width
    (r10 ADVICE): ``v1000000.json`` — wider than the :06d format —
    must still parse, or versions ≥ 1e6 vanish from history and lose
    time-retention protection."""
    import re

    # the exact pattern now used at versioned.py:1265 and :2701
    pat = re.compile(r"v(\d+)\.json$")
    assert pat.search("x/_manifests/v000007.json").group(1) == "000007"
    assert pat.search("x/_manifests/v1000000.json").group(1) == "1000000"


def test_point_read_asof_and_tag(spark, tmp_path):
    """read_version_point(asof=, tag=) mirrors read_version_where's
    snapshot selection (r10): point-reading the release-blessed
    snapshot goes through the Bloom sidecar AT that version — a later
    commit (which changes the key's row) is invisible to both the
    tagged and the as-of read."""
    import time

    from tms_etl_spark.operators.bloomindex import (
        build_bloom_index,
        read_version_point,
    )
    from tms_etl_spark.operators.versioned import tag_version

    tdir = str(tmp_path / "pointasof")
    write_version(
        _mk(spark, [(i, f"old{i}") for i in range(50)],
            "k int, s string").coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "k")
    tag_version(spark, tdir, "blessed")
    mid = time.time() + 0.05
    time.sleep(1.2)
    write_version(
        _mk(spark, [(7, "NEW7")], "k int, s string"), tdir, "overwrite"
    )
    tagged = read_version_point(spark, tdir, "k", 7, tag="blessed")
    assert [r["s"] for r in tagged.collect()] == ["old7"]
    asof = read_version_point(spark, tdir, "k", 7, asof=mid)
    assert [r["s"] for r in asof.collect()] == ["old7"]
    head = read_version_point(spark, tdir, "k", 7)
    assert [r["s"] for r in head.collect()] == ["NEW7"]
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_version_point(spark, tdir, "k", 7, version=1, tag="blessed")


def test_cli_point_asof_tag(spark, tmp_path, capsys):
    """CLI `table point --tag/--asof/--version` resolves the snapshot
    and types the --value against the RESOLVED schema (a pre-widening
    tag still casts the key as int)."""
    from tms_etl_spark.__main__ import main
    from tms_etl_spark.operators.bloomindex import build_bloom_index
    from tms_etl_spark.operators.versioned import tag_version

    tdir = str(tmp_path / "clipoint")
    write_version(
        _mk(spark, [(i, i * 2) for i in range(30)],
            "k int, v int").coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "k")
    tag_version(spark, tdir, "rel1")
    write_version(_mk(spark, [(7, 777)], "k int, v int"),
                  tdir, "overwrite")
    assert main(
        ["table", "point", tdir, "--col", "k", "--value", "7",
         "--tag", "rel1"]
    ) == 0
    out = capsys.readouterr().out
    assert "14" in out and "777" not in out
    assert main(
        ["table", "point", tdir, "--col", "k", "--value", "7"]
    ) == 0
    assert "777" in capsys.readouterr().out
    assert main(
        ["table", "point", tdir, "--col", "k", "--value", "7",
         "--tag", "rel1", "--version", "1"]
    ) == 2


def test_delete_where_semantics(spark, tmp_path):
    """delete_where: predicate slice gone, survivors exact, no-op
    predicates commit nothing, non-unique keys refuse with the
    overreach count, allow_key_scope opts into key-level semantics,
    and rand() predicates refuse."""
    from tms_etl_spark.operators.versioned import (
        current_version,
        delete_where,
    )

    tdir = str(tmp_path / "delwhere")
    write_version(
        _mk(
            spark,
            [(i, "err" if i % 3 == 0 else "ok", float(i)) for i in range(30)],
            "k int, status string, v double",
        ),
        tdir,
        "append",
    )
    v = delete_where(spark, tdir, "status = 'err' AND v < 15", "k")
    assert v == 2
    left = {r["k"] for r in read_version(spark, tdir).collect()}
    assert left == set(range(30)) - {0, 3, 6, 9, 12}
    # no-op: zero matches → no empty commit
    assert delete_where(spark, tdir, "v > 1e9", "k") == 2
    assert current_version(spark, tdir) == 2
    # rand() refuses
    with pytest.raises(ValueError, match="[Nn]on-deterministic"):
        delete_where(spark, tdir, "rand() < 0.5", "k")


def test_delete_where_key_scope_guard(spark, tmp_path):
    """A non-unique key over the matched set refuses by default (the
    vector would over-delete) and deletes the whole key group under
    allow_key_scope=True."""
    from tms_etl_spark.operators.versioned import delete_where

    tdir = str(tmp_path / "delscope")
    write_version(
        _mk(
            spark,
            [(1, 5.0), (1, 50.0), (2, 7.0), (3, 9.0)],
            "k int, v double",
        ),
        tdir,
        "append",
    )
    with pytest.raises(ValueError, match="over-delete"):
        delete_where(spark, tdir, "v < 10", "k")
    delete_where(spark, tdir, "v < 10", "k", allow_key_scope=True)
    assert [r["v"] for r in read_version(spark, tdir).collect()] == []


def test_cli_delete_where(spark, tmp_path, capsys):
    """CLI `table delete --where` commits the vector; --values and
    --where are mutually exclusive; guard errors exit 2."""
    from tms_etl_spark.__main__ import main

    tdir = str(tmp_path / "clidelw")
    write_version(
        _mk(spark, [(i, float(i)) for i in range(10)],
            "k int, v double"),
        tdir,
        "append",
    )
    assert main(
        ["table", "delete", tdir, "--key", "k", "--where", "v < 3"]
    ) == 0
    assert "committed v2" in capsys.readouterr().out
    assert {
        r["k"] for r in read_version(spark, tdir).collect()
    } == set(range(3, 10))
    assert main(["table", "delete", tdir, "--key", "k"]) == 2
    assert main(
        ["table", "delete", tdir, "--key", "k",
         "--values", "5", "--where", "v < 9"]
    ) == 2


def test_rename_column_metadata_only(spark, tmp_path):
    """rename_column is one manifest commit: reads show the new name
    with identical values, appends AFTER the rename land under the
    stable physical name (one uniform on-disk schema), zonemap
    pruning keeps working through the remapped stats, deletion
    vectors survive the seam, and time travel shows the old name."""
    from tms_etl_spark.operators.versioned import (
        delete_rows,
        read_version_where,
        rename_column,
    )

    tdir = str(tmp_path / "rename")
    write_version(
        _mk(spark, [(i, f"s{i}", float(i)) for i in range(20)],
            "uid int, s string, v double").coalesce(2),
        tdir,
        "append",
    )
    v = rename_column(spark, tdir, "uid", "user_id")
    assert v == 2
    out = read_version(spark, tdir)
    assert out.columns == ["user_id", "s", "v"]
    assert {r["user_id"] for r in out.collect()} == set(range(20))
    # time travel: pre-rename snapshot keeps the old name
    assert read_version(spark, tdir, version=1).columns == [
        "uid", "s", "v"
    ]
    # append AFTER the rename: logical user_id, physical uid on disk
    write_version(
        _mk(spark, [(100, "new", 1.5)],
            "user_id int, s string, v double"),
        tdir,
        "append",
    )
    got = read_version(spark, tdir)
    assert 100 in {r["user_id"] for r in got.collect()}
    # WHERE pruning consults the remapped (logical-keyed) stats
    pruned = read_version_where(spark, tdir, "user_id = 100")
    assert [r["s"] for r in pruned.collect()] == ["new"]
    # deletion vector across the seam: delete by the NEW name
    delete_rows(
        spark, tdir, _mk(spark, [(100,), (3,)], "user_id int")
    )
    left = {r["user_id"] for r in read_version(spark, tdir).collect()}
    assert left == set(range(20)) - {3}
    # rename again: uid -> user_id -> uid2 keeps ONE stable physical
    rename_column(spark, tdir, "user_id", "uid2")
    assert {
        r["uid2"] for r in read_version(spark, tdir).collect()
    } == left


def test_rename_column_refusals(spark, tmp_path):
    """Unknown/colliding names, partition columns, generated-column
    sources and constrained columns all refuse; a new logical name
    may also not shadow another column's physical name."""
    from tms_etl_spark.operators.versioned import rename_column

    tdir = str(tmp_path / "renameref")
    write_version(
        _mk(spark, [(1, "2024-01-01 00:00:00", 5.0)],
            "k int, ts_s string, v double")
        .selectExpr("k", "cast(ts_s as timestamp) as ts", "v"),
        tdir,
        "append",
        partition_by=["p_day"],
        partition_exprs={"p_day": "date_format(ts, 'yyyy-MM-dd')"},
        constraints={"v_pos": "v >= 0"},
    )
    with pytest.raises(ValueError, match="unknown column"):
        rename_column(spark, tdir, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(spark, tdir, "k", "v")
    with pytest.raises(ValueError, match="partition column"):
        rename_column(spark, tdir, "p_day", "day2")
    with pytest.raises(ValueError, match="generated column"):
        rename_column(spark, tdir, "ts", "event_ts")
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_column(spark, tdir, "v", "val")
    # physical-name shadowing: k -> kk frees the logical name "k",
    # but ANOTHER column renamed INTO the still-occupied physical
    # "k" must refuse (two logical columns, one on-disk name), and
    # so must an appended batch ADDING a column named "k"
    rename_column(spark, tdir, "k", "kk")
    tdir2 = str(tmp_path / "renameref2")
    write_version(
        _mk(spark, [(1, 2)], "a int, b int"), tdir2, "append"
    )
    rename_column(spark, tdir2, "a", "aa")
    with pytest.raises(ValueError, match="PHYSICAL"):
        rename_column(spark, tdir2, "b", "a")
    with pytest.raises(ValueError, match="PHYSICAL"):
        write_version(
            _mk(spark, [(3, 4, 5)], "aa int, b int, a int"),
            tdir2,
            "append",
            merge_schema=True,
        )


def test_rename_column_bloom_sidecar_carries(spark, tmp_path):
    """The Bloom family moves with the rename and keeps assisting
    point reads after a maintenance extend — content is
    (file, hashed-value) pairs, column-name-free."""
    from tms_etl_spark.operators.bloomindex import (
        build_bloom_index,
        read_version_point,
    )
    from tms_etl_spark.operators.versioned import (
        maintain_table,
        rename_column,
    )

    tdir = str(tmp_path / "renamebloom")
    write_version(
        _mk(spark, [(i, i * 3) for i in range(40)],
            "uid int, payload int").coalesce(2),
        tdir,
        "append",
    )
    build_bloom_index(spark, tdir, "uid")
    rename_column(spark, tdir, "uid", "user_id")
    out = maintain_table(spark, tdir)
    assert out["extended_indexes"].get("user_id:bloom") == "extended"
    got = read_version_point(spark, tdir, "user_id", 7)
    assert [r["payload"] for r in got.collect()] == [21]


def test_cli_rename_column(spark, tmp_path, capsys):
    """CLI `table rename-column` commits the metadata-only rename;
    refusals exit 2 with the reason on stderr."""
    from tms_etl_spark.__main__ import main

    tdir = str(tmp_path / "clirename")
    write_version(
        _mk(spark, [(1, 2.0)], "k int, v double"), tdir, "append"
    )
    assert main(["table", "rename-column", tdir, "k", "key_id"]) == 0
    assert "committed v2" in capsys.readouterr().out
    assert read_version(spark, tdir).columns == ["key_id", "v"]
    assert main(["table", "rename-column", tdir, "nope", "x"]) == 2


def test_add_drop_column_metadata_only(spark, tmp_path):
    """drop_column stops projecting (zero data I/O), add_column
    null-fills history reader-side; re-adding a dropped name mints a
    FRESH physical name so the old files' orphaned bytes never
    resurrect — including via append evolution, which refuses."""
    from tms_etl_spark.operators.versioned import (
        add_column,
        drop_column,
    )

    tdir = str(tmp_path / "adddrop")
    write_version(
        _mk(spark, [(1, "a", 1.5), (2, "b", 2.5)],
            "k int, s string, value double"),
        tdir,
        "append",
    )
    drop_column(spark, tdir, "value")
    assert read_version(spark, tdir).columns == ["k", "s"]
    # time travel pre-drop shows the column
    assert "value" in read_version(spark, tdir, version=1).columns
    # re-add same name: fresh physical, history reads NULL
    add_column(spark, tdir, "value", "double")
    got = {r["k"]: r["value"] for r in read_version(spark, tdir).collect()}
    assert got == {1: None, 2: None}
    # append evolution may NOT re-introduce a dropped physical name
    tdir2 = str(tmp_path / "adddrop2")
    write_version(
        _mk(spark, [(1, 1.0)], "k int, gone double"), tdir2, "append"
    )
    drop_column(spark, tdir2, "gone")
    with pytest.raises(ValueError, match="previously DROPPED"):
        write_version(
            _mk(spark, [(2, 3.0)], "k int, gone double"),
            tdir2,
            "append",
            merge_schema=True,
        )


def test_add_drop_column_refusals(spark, tmp_path):
    """Partition/generated/constrained columns and active
    delete-vector keys refuse DROP; bad types and collisions refuse
    ADD; the last column refuses DROP."""
    from tms_etl_spark.operators.versioned import (
        add_column,
        delete_rows,
        drop_column,
    )

    tdir = str(tmp_path / "adddropref")
    write_version(
        _mk(spark, [(1, "x", 5.0)], "k int, s string, v double"),
        tdir,
        "append",
        constraints={"v_pos": "v >= 0"},
    )
    with pytest.raises(ValueError, match="CHECK constraint"):
        drop_column(spark, tdir, "v")
    with pytest.raises(ValueError, match="already exists"):
        add_column(spark, tdir, "k", "long")
    with pytest.raises(ValueError, match="cannot parse type"):
        add_column(spark, tdir, "x", "not_a_type")
    delete_rows(spark, tdir, _mk(spark, [(1,)], "k int"))
    with pytest.raises(ValueError, match="deletion"):
        drop_column(spark, tdir, "k")
    tdir2 = str(tmp_path / "lastcol")
    write_version(_mk(spark, [(1,)], "k int"), tdir2, "append")
    with pytest.raises(ValueError, match="last column"):
        drop_column(spark, tdir2, "k")


def test_cli_add_drop_column(spark, tmp_path, capsys):
    """CLI `table add-column/drop-column` commit; refusals exit 2."""
    from tms_etl_spark.__main__ import main

    tdir = str(tmp_path / "cliadddrop")
    write_version(
        _mk(spark, [(1, 2.0)], "k int, v double"), tdir, "append"
    )
    assert main(["table", "drop-column", tdir, "v"]) == 0
    assert read_version(spark, tdir).columns == ["k"]
    assert main(["table", "add-column", tdir, "score", "double"]) == 0
    assert read_version(spark, tdir).columns == ["k", "score"]
    assert main(["table", "drop-column", tdir, "nope"]) == 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# a random ALTER/DML program: each step is one of append / rename /
# add / drop / delete-by-key; the model is a plain dict {key: row}
_OPS = st.lists(
    st.sampled_from(
        ["append", "rename", "add", "drop", "delete", "compact", "merge"]
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS, data=st.data())
def test_alter_program_matches_model(spark, tmp_path_factory, ops, data):
    """Property net: ANY interleaving of appends, metadata-only
    renames/adds/drops and key deletes reads back exactly what a
    driver-side dict model predicts — logical names current, dropped
    data gone forever (no resurrection), null-fill where the model
    says None."""
    from tms_etl_spark.operators.versioned import (
        add_column,
        delete_rows,
        drop_column,
        rename_column,
    )

    tdir = str(tmp_path_factory.mktemp("alterprog") / "t")
    cols = ["c0"]  # logical schema, k is implicit and never altered
    next_c = 1
    model: dict[int, dict] = {}
    next_k = 0
    write_version(
        _mk(spark, [(next_k, 0.5)], "k int, c0 double"), tdir, "append"
    )
    model[next_k] = {"c0": 0.5}
    next_k += 1
    for op in ops:
        if op == "append":
            row = {
                c: data.draw(
                    st.one_of(st.none(), st.floats(0, 100, width=32))
                )
                for c in cols
            }
            ddl = "k int, " + ", ".join(f"{c} double" for c in cols)
            write_version(
                _mk(spark, [tuple([next_k] + [row[c] for c in cols])], ddl),
                tdir,
                "append",
            )
            model[next_k] = dict(row)
            next_k += 1
        elif op == "rename" and cols:
            old = data.draw(st.sampled_from(cols))
            new = f"c{next_c}"
            next_c += 1
            rename_column(spark, tdir, old, new)
            cols[cols.index(old)] = new
            for r in model.values():
                r[new] = r.pop(old)
        elif op == "add":
            new = f"c{next_c}"
            next_c += 1
            add_column(spark, tdir, new, "double")
            cols.append(new)
            for r in model.values():
                r[new] = None
        elif op == "drop" and len(cols) > 1:
            victim = data.draw(st.sampled_from(cols))
            drop_column(spark, tdir, victim)
            cols.remove(victim)
            for r in model.values():
                r.pop(victim)
        elif op == "delete" and model:
            doomed = data.draw(st.sampled_from(sorted(model)))
            delete_rows(spark, tdir, _mk(spark, [(doomed,)], "k int"))
            model.pop(doomed)
        elif op == "compact":
            from tms_etl_spark.operators.versioned import (
                optimize_incremental,
            )

            optimize_incremental(spark, tdir, min_file_bytes=10**9)
        elif op == "merge" and model:
            tgt = data.draw(st.sampled_from(sorted(model)))
            row = {
                c: data.draw(
                    st.one_of(st.none(), st.floats(0, 100, width=32))
                )
                for c in cols
            }
            ddl = "k int, " + ", ".join(f"{c} double" for c in cols)
            merge_version(
                spark,
                tdir,
                _mk(spark, [tuple([tgt] + [row[c] for c in cols])], ddl),
                key="k",
            )
            model[tgt] = dict(row)
    got = {
        r["k"]: {c: r[c] for c in cols}
        for r in read_version(spark, tdir).collect()
    }
    want = {
        k: {c: (None if v is None else pytest.approx(v)) for c, v in r.items()}
        for k, r in model.items()
    }
    assert got == want


def test_optimize_after_rename_keeps_physical_schema(spark, tmp_path):
    """Compaction and full OPTIMIZE on a renamed table rewrite files
    under the stable PHYSICAL names (one uniform on-disk schema), so
    reads, WHERE pruning and later renames keep working after the
    rewrite; delete_where composes on top."""
    from tms_etl_spark.operators.versioned import (
        delete_where,
        optimize_incremental,
        optimize_version,
        read_version_where,
        rename_column,
    )

    tdir = str(tmp_path / "optrename")
    for half in (0, 1):
        write_version(
            _mk(spark,
                [(i, float(i)) for i in range(half * 20, half * 20 + 20)],
                "uid int, v double").coalesce(2),
            tdir,
            "append",
        )
    rename_column(spark, tdir, "uid", "user_id")
    optimize_incremental(spark, tdir, min_file_bytes=10**9)
    got = {r["user_id"] for r in read_version(spark, tdir).collect()}
    assert got == set(range(40))
    optimize_version(spark, tdir, cluster_by="user_id")
    assert {
        r["user_id"] for r in read_version(spark, tdir).collect()
    } == set(range(40))
    pr = read_version_where(spark, tdir, "user_id >= 35")
    assert {r["user_id"] for r in pr.collect()} == set(range(35, 40))
    delete_where(spark, tdir, "user_id < 5", "user_id")
    assert {
        r["user_id"] for r in read_version(spark, tdir).collect()
    } == set(range(5, 40))


def test_stream_to_versioned_exactly_once(spark, tmp_path):
    """The versioned streaming sink commits each micro-batch with an
    epoch txn id: restarting the stream over the SAME source files
    (fresh checkpoint simulating an epoch replay via explicit txn
    reuse) does not double-append; MERGE mode upserts by key; a
    drifting batch evolves the schema under merge_schema=True."""
    import time

    from tms_etl_spark.operators.versioned import (
        current_version,
        write_version as wv,
    )
    from tms_etl_spark.streaming.incremental import stream_to_versioned

    src_dir = str(tmp_path / "src")
    tdir = str(tmp_path / "vt")
    ck1 = str(tmp_path / "ck1")
    _mk(spark, [(1, "a"), (2, "b")], "k int, s string").write.parquet(
        src_dir
    )
    stream = spark.readStream.schema("k int, s string").parquet(src_dir)
    q = stream_to_versioned(stream, tdir, ck1)
    q.awaitTermination(60)
    rows1 = sorted(read_version(spark, tdir).collect())
    assert [r["k"] for r in rows1] == [1, 2]
    v1 = current_version(spark, tdir)
    # replayed epoch: same txn id short-circuits (no new version)
    wv(
        _mk(spark, [(1, "a"), (2, "b")], "k int, s string"),
        tdir,
        "append",
        txn_id="stream-0",
    )
    assert current_version(spark, tdir) == v1
    # MERGE mode with schema drift: second source batch updates k=2
    # and carries a NEW column
    src2 = str(tmp_path / "src2")
    ck2 = str(tmp_path / "ck2")
    _mk(
        spark, [(2, "B2", 7), (3, "c", 9)], "k int, s string, extra int"
    ).write.parquet(src2)
    stream2 = spark.readStream.schema(
        "k int, s string, extra int"
    ).parquet(src2)
    q2 = stream_to_versioned(
        stream2, tdir, ck2, key="k", merge_schema=True,
        txn_prefix="stream2",
    )
    q2.awaitTermination(60)
    got = {
        r["k"]: (r["s"], r["extra"])
        for r in read_version(spark, tdir).collect()
    }
    assert got == {1: ("a", None), 2: ("B2", 7), 3: ("c", 9)}


def test_rowdiff_across_alter_seam(spark, tmp_path):
    """The manifest-derived CDC feed aligns across ALTER seams by
    PHYSICAL identity (r10): a rename produces zero spurious updates,
    an added column null-fills pre-images, and a re-added (previously
    dropped) column reads NULL on the pre side — the resurrection
    guard holds in the CDC view too."""
    from tms_etl_spark.operators.versioned import (
        add_column,
        drop_column,
        merge_version,
        read_version_rowdiff,
        rename_column,
    )

    tdir = str(tmp_path / "cdcalter")
    write_version(
        _mk(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
            "k int, s string, v double").coalesce(1),
        tdir,
        "append",
    )
    rename_column(spark, tdir, "v", "val")          # v2
    drop_column(spark, tdir, "s")                   # v3
    add_column(spark, tdir, "s", "string")          # v4: fresh physical
    # v5: MERGE updates k=2's val and sets the re-added s
    merge_version(
        spark,
        tdir,
        _mk(spark, [(2, "B2", 20.0)], "k int, s string, val double"),
        key="k",
    )
    diff = {
        r["k"]: (r["op"], r["s"], r["val"])
        for r in read_version_rowdiff(
            spark, tdir, key="k", from_version=1
        ).collect()
    }
    # k=1,3 were rewritten by the CoW but with value-identical
    # (val mapped via rename; s: old physical dropped -> pre NULL,
    # post NULL) rows — they must classify OUT of the feed
    assert diff == {2: ("update", "B2", 20.0)}


def test_describe_detail_reports_column_map(spark, tmp_path):
    """DESCRIBE DETAIL surfaces the rename map and the dropped
    physical names — the metadata an operator needs to understand a
    mapped table's on-disk layout."""
    from tms_etl_spark.operators.versioned import (
        describe_detail,
        drop_column,
        rename_column,
    )

    tdir = str(tmp_path / "detailmap")
    write_version(
        _mk(spark, [(1, "a", 2.0)], "k int, s string, v double"),
        tdir,
        "append",
    )
    rename_column(spark, tdir, "k", "key_id")
    drop_column(spark, tdir, "s")
    d = describe_detail(spark, tdir)
    assert d["column_map"] == {"key_id": "k"}
    assert d["dropped_physicals"] == ["s"]


def test_mapped_column_refused_as_partition_column(spark, tmp_path):
    """A renamed (mapped) column can never become a partition column
    — hive paths bake the NAME in, and physical ≠ logical would make
    the partition value unrecoverable. Both the append path and
    OPTIMIZE's partition-spec evolution refuse."""
    from tms_etl_spark.operators.versioned import (
        optimize_version,
        rename_column,
    )

    tdir = str(tmp_path / "mappedpart")
    write_version(
        _mk(spark, [(1, "x", 2.0)], "k int, seg string, v double"),
        tdir,
        "append",
    )
    rename_column(spark, tdir, "seg", "segment")
    with pytest.raises(ValueError, match="partition"):
        optimize_version(spark, tdir, partition_by=["segment"])
    with pytest.raises(ValueError, match="partition"):
        write_version(
            _mk(spark, [(2, "y", 3.0)], "k int, segment string, v double"),
            tdir,
            "append",
            partition_by=["segment"],
        )
    # an UNMAPPED column still evolves the spec fine
    optimize_version(spark, tdir, partition_by=["k"])
    assert {r["segment"] for r in read_version(spark, tdir).collect()} == {"x"}
