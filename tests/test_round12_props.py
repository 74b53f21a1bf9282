"""Round-12 nets, part 1 — optimistic concurrency for the DML/ALTER
verbs (VERDICT r11 next-round #1): `merge_version` / `delete_rows` /
`delete_where` / `rename_column` / `add_column` / `drop_column` gain
``commit_retries=N`` with CONFLICT DETECTION. A lost commit race
re-runs the operation against the winner's head ONLY when the
winner's manifests prove every change disjoint from the loser's
read+write set; a real intersection raises the NAMED conflict —
Delta's ConcurrentAppend / ConcurrentDeleteRead / Metadata /
Overwrite taxonomy (public analog; original implementation over this
engine's manifest format).

The race is injected DETERMINISTICALLY: `_inject_winner` patches the
module's conditional-commit point so the loser's FIRST manifest
commit is preceded by the winner landing a competing commit — the
loser then hits the real ConcurrentWriteError and the real conflict
walk, every run. (The two-JVM harness in test_commit_race.py covers
the nondeterministic-interleaving side.)

Reference analog: the engine this replaces serialized all writers
behind a GUI-global `is_running` mutex
(/root/reference/src/main_01.py:1088-1092); here disjoint writers
land concurrently and only true conflicts refuse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import tms_etl_spark.operators.versioned as V
from tms_etl_spark.operators.versioned import (
    ConcurrentAppendError,
    ConcurrentDeleteReadError,
    ConcurrentMetadataError,
    ConcurrentModificationError,
    ConcurrentOverwriteError,
    add_column,
    delete_rows,
    delete_where,
    merge_version,
    read_version,
    rename_column,
    write_version,
)


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _inject_winner(monkeypatch, winner_fn):
    """Make the NEXT manifest commit lose its race: the first
    `_write_json_atomic` call runs ``winner_fn()`` (which lands its
    own commit, re-entrantly passing through) before proceeding, so
    the original caller collides on a now-taken version number."""
    orig = V._write_json_atomic
    state = {"fired": False}

    def hooked(spark, path, payload):
        if not state["fired"]:
            state["fired"] = True
            winner_fn()
        return orig(spark, path, payload)

    monkeypatch.setattr(V, "_write_json_atomic", hooked)
    return state


def _base_table(spark, tmp_path, name="t"):
    tdir = str(tmp_path / name)
    write_version(
        spark.range(0, 100)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).cast("int").alias("v"),
        )
        .coalesce(1),
        tdir,
        "append",
    )
    return tdir


def _rows(spark, tdir):
    return {
        r["k"]: r["v"] for r in read_version(spark, tdir).collect()
    }


# ---------------------------------------------------------------------------
# MERGE vs concurrent commits
# ---------------------------------------------------------------------------


def test_merge_retries_past_disjoint_append(spark, tmp_path, monkeypatch):
    """MERGE keys 0..9 vs a winner appending keys 200..209: the
    winner's added file is zonemap-disjoint from the merge keys, so
    the retry lands and the table equals serial application."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(200 + i, -1) for i in range(10)], "k int, v int")
            .coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    v = merge_version(spark, tdir, src, "k", commit_retries=2)
    assert v == 3  # base=1, winner=2, retried merge=3
    got = _rows(spark, tdir)
    assert all(got[i] == 7777 for i in range(10))
    assert all(got[200 + i] == -1 for i in range(10))
    assert got[50] == 500  # untouched rows intact


def test_merge_refuses_overlapping_append(spark, tmp_path, monkeypatch):
    """The winner appends a row whose key the merge would have
    matched → ConcurrentAppendError names the file, no retry."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(5, -1)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    with pytest.raises(ConcurrentAppendError, match="key range"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_merge_retries_past_disjoint_delete(spark, tmp_path, monkeypatch):
    """Winner tombstones keys 50..59 (its vector records key
    bounds); merge keys 0..9 are provably disjoint → retry lands,
    final table equals serial application of delete then merge."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        delete_rows(
            spark,
            tdir,
            _mk(spark, [(50 + i,) for i in range(10)], "k int"),
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    merge_version(spark, tdir, src, "k", commit_retries=2)
    got = _rows(spark, tdir)
    assert all(got[i] == 7777 for i in range(10))
    assert all(50 + i not in got for i in range(10))
    assert len(got) == 100 - 10


def test_merge_refuses_overlapping_delete(spark, tmp_path, monkeypatch):
    """Winner tombstones keys the merge read (bounds overlap) →
    ConcurrentDeleteReadError: the merge's matched/unmatched
    decisions were made against rows that no longer exist."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        delete_rows(
            spark, tdir, _mk(spark, [(5,), (6,)], "k int")
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    with pytest.raises(ConcurrentDeleteReadError, match="tombstoned"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_merge_refuses_concurrent_rewrite(spark, tmp_path, monkeypatch):
    """The winner is itself a MERGE rewriting a file the loser read
    → ConcurrentDeleteReadError (removed/rewrote)."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        merge_version(
            spark,
            tdir,
            _mk(spark, [(7, -7)], "k int, v int"),
            "k",
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    with pytest.raises(ConcurrentDeleteReadError, match="removed or rewrote"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_merge_refuses_metadata_change(spark, tmp_path, monkeypatch):
    tdir = _base_table(spark, tmp_path)
    _inject_winner(monkeypatch, lambda: add_column(spark, tdir, "extra", "int"))
    src = _mk(spark, [(1, 7777)], "k int, v int")
    with pytest.raises(ConcurrentMetadataError, match="metadata"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_merge_refuses_concurrent_overwrite(spark, tmp_path, monkeypatch):
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(0, 0)], "k int, v int"), tdir, "overwrite"
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(1, 7777)], "k int, v int")
    with pytest.raises(ConcurrentOverwriteError, match="overwrite"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_full_sync_merge_refuses_any_append(spark, tmp_path, monkeypatch):
    """A full-sync merge reads (and may delete) the WHOLE table, so
    even a key-disjoint concurrent append conflicts — the snapshot
    answer for 'make the table mirror the source'."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(900, -1)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(i, 7777) for i in range(10)], "k int, v int")
    with pytest.raises(ConcurrentAppendError):
        merge_version(
            spark,
            tdir,
            src,
            "k",
            when_not_matched_by_source="delete",
            commit_retries=2,
        )


def test_merge_without_retries_raises_raw_signal(spark, tmp_path, monkeypatch):
    """commit_retries=0 (default) keeps the old contract: the raw
    ConcurrentWriteError surfaces, now carrying the retry context."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(900, -1)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    src = _mk(spark, [(1, 7777)], "k int, v int")
    with pytest.raises(V.ConcurrentWriteError) as ei:
        merge_version(spark, tdir, src, "k")
    assert ei.value.retry_ctx["base_version"] == 1
    assert ei.value.retry_ctx["read_rels"]


def test_merge_retry_exhaustion_reraises_lost_race(
    spark, tmp_path, monkeypatch
):
    """Every attempt losing a (disjoint) race exhausts the budget and
    re-raises the LAST raw lost-race error, not a named conflict."""
    tdir = _base_table(spark, tmp_path)
    orig = V._write_json_atomic
    state = {"n": 0}

    def hooked(spark_, path, payload):
        # a fresh disjoint append sneaks in before EVERY attempt
        if "-merge-" in str(payload.get("dirs", ["x"])[-1]):
            state["n"] += 1
            write_version(
                _mk(spark, [(500 + state["n"], -1)], "k int, v int")
                .coalesce(1),
                tdir,
                "append",
            )
        return orig(spark_, path, payload)

    monkeypatch.setattr(V, "_write_json_atomic", hooked)
    src = _mk(spark, [(1, 7777)], "k int, v int")
    with pytest.raises(V.ConcurrentWriteError):
        merge_version(spark, tdir, src, "k", commit_retries=1)
    assert state["n"] == 2  # initial attempt + 1 retry, both lost


# ---------------------------------------------------------------------------
# DELETE vs concurrent commits
# ---------------------------------------------------------------------------


def test_delete_retries_past_disjoint_append(spark, tmp_path, monkeypatch):
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(300, -1)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    delete_rows(
        spark,
        tdir,
        _mk(spark, [(i,) for i in range(5)], "k int"),
        commit_retries=2,
    )
    got = _rows(spark, tdir)
    assert all(i not in got for i in range(5))
    assert got[300] == -1


def test_delete_refuses_append_into_key_range(spark, tmp_path, monkeypatch):
    """The winner re-inserts a key the delete targets: the vector is
    scoped to the BASE dirs, so a re-run would erase the winner's
    new row — snapshot semantics say refuse (ConcurrentAppend)."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(3, 999)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    with pytest.raises(ConcurrentAppendError):
        delete_rows(
            spark,
            tdir,
            _mk(spark, [(i,) for i in range(5)], "k int"),
            commit_retries=2,
        )


def test_delete_retries_past_disjoint_delete(spark, tmp_path, monkeypatch):
    """delete/delete on provably disjoint key ranges commutes: the
    winner's tombstone bounds prove it, the retry lands."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        delete_rows(
            spark, tdir, _mk(spark, [(90,), (91,)], "k int")
        )

    _inject_winner(monkeypatch, winner)
    delete_rows(
        spark,
        tdir,
        _mk(spark, [(0,), (1,)], "k int"),
        commit_retries=2,
    )
    got = _rows(spark, tdir)
    assert set(got) == set(range(100)) - {0, 1, 90, 91}


def test_delete_where_retries_past_predicate_disjoint_append(
    spark, tmp_path, monkeypatch
):
    """delete_where's append test is the PREDICATE's pruning groups:
    a winner append whose zonemap proves no row matches the WHERE is
    no conflict, even though plain key bounds could not prove it."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        # v large and positive: provably no match for "v < 0"
        write_version(
            _mk(spark, [(1000, 5000)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    # make keys 0..4 negative-valued so the predicate matches them
    merge_version(
        spark,
        tdir,
        _mk(spark, [(i, -i - 1) for i in range(5)], "k int, v int"),
        "k",
    )
    _inject_winner(monkeypatch, winner)
    delete_where(spark, tdir, "v < 0", key="k", commit_retries=2)
    got = _rows(spark, tdir)
    assert all(i not in got for i in range(5))
    assert got[1000] == 5000


def test_delete_where_refuses_predicate_matching_append(
    spark, tmp_path, monkeypatch
):
    tdir = _base_table(spark, tmp_path)
    merge_version(
        spark,
        tdir,
        _mk(spark, [(i, -i - 1) for i in range(5)], "k int, v int"),
        "k",
    )

    def winner():
        write_version(
            _mk(spark, [(1000, -5000)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    with pytest.raises(ConcurrentAppendError):
        delete_where(spark, tdir, "v < 0", key="k", commit_retries=2)


# ---------------------------------------------------------------------------
# ALTER vs concurrent commits
# ---------------------------------------------------------------------------


def test_alter_retries_past_data_commits(spark, tmp_path, monkeypatch):
    """Metadata-only ALTERs re-decide everything on re-run, so data
    commits (append / merge / delete) never conflict with them."""
    tdir = _base_table(spark, tmp_path)

    def winner():
        write_version(
            _mk(spark, [(700, -1)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    rename_column(spark, tdir, "v", "val", commit_retries=2)
    got = read_version(spark, tdir)
    assert "val" in got.columns and "v" not in got.columns
    assert got.where(F.col("k") == 700).head()["val"] == -1


def test_alter_refuses_concurrent_metadata_change(
    spark, tmp_path, monkeypatch
):
    tdir = _base_table(spark, tmp_path)
    _inject_winner(
        monkeypatch, lambda: add_column(spark, tdir, "extra", "int")
    )
    with pytest.raises(ConcurrentMetadataError):
        rename_column(spark, tdir, "v", "val", commit_retries=2)


def test_named_conflicts_are_not_the_raw_signal(spark, tmp_path):
    """The taxonomy is deliberately NOT under ConcurrentWriteError:
    a retry loop catching the raw lost-race signal must never
    swallow a named conflict."""
    assert not issubclass(
        ConcurrentModificationError, V.ConcurrentWriteError
    )
    for cls in (
        ConcurrentAppendError,
        ConcurrentDeleteReadError,
        ConcurrentMetadataError,
        ConcurrentOverwriteError,
    ):
        assert issubclass(cls, ConcurrentModificationError)


def test_delete_vector_records_key_bounds(spark, tmp_path):
    """Every delete commit records its key-range bounds in the
    tombstone entry — what OTHER writers' conflict checks use to
    prove disjointness against it."""
    import json
    import pathlib

    tdir = _base_table(spark, tmp_path)
    v = delete_rows(
        spark, tdir, _mk(spark, [(10,), (19,)], "k int")
    )
    man = json.loads(
        (pathlib.Path(tdir) / "_manifests" / f"v{v:06d}.json").read_text()
    )
    assert man["deletes"][-1]["bounds"] == {"k": [10, 19]}


# ---------------------------------------------------------------------------
# Round-12 part 2: conditional NOT MATCHED BY SOURCE (VERDICT r11 #4)
# ---------------------------------------------------------------------------


def test_merge_sync_window_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE AND <cond> THEN DELETE — the
    partial-sync shape: unmatched target rows inside the sync window
    survive, stale unmatched rows are deleted, matched rows update,
    new keys insert. NULL condition keeps the row (conservative)."""
    tdir = str(tmp_path / "sw")
    write_version(
        _mk(
            spark,
            [
                (1, 10, 100),   # matched → update
                (2, 20, 100),   # unmatched, fresh → kept
                (3, 30, 10),    # unmatched, stale → deleted
                (4, 40, None),  # unmatched, NULL age → kept
            ],
            "k int, v int, age int",
        ).coalesce(1),
        tdir,
        "append",
    )
    src = _mk(spark, [(1, 111, 100), (9, 99, 100)], "k int, v int, age int")
    merge_version(
        spark,
        tdir,
        src,
        "k",
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="target.age < 50",
    )
    got = {r["k"]: r["v"] for r in read_version(spark, tdir).collect()}
    assert got == {1: 111, 2: 20, 4: 40, 9: 99}


def test_merge_update_by_source(spark, tmp_path):
    """when_not_matched_by_source='update' + SET: the soft-delete /
    mark-stale shape — unmatched condition-passing rows land with
    the SET expressions applied, everything else unchanged."""
    tdir = str(tmp_path / "ubs")
    write_version(
        _mk(
            spark,
            [(1, 10, "live"), (2, 20, "live"), (3, 30, "live")],
            "k int, v int, s string",
        ).coalesce(1),
        tdir,
        "append",
    )
    src = _mk(spark, [(1, 111, "live")], "k int, v int, s string")
    merge_version(
        spark,
        tdir,
        src,
        "k",
        when_not_matched_by_source="update",
        when_not_matched_by_source_condition="target.v >= 30",
        when_not_matched_by_source_set={"s": "'stale'", "v": "v * -1"},
    )
    got = {
        r["k"]: (r["v"], r["s"])
        for r in read_version(spark, tdir).collect()
    }
    assert got == {
        1: (111, "live"),
        2: (20, "live"),   # unmatched but condition fails
        3: (-30, "stale"),  # unmatched + condition → SET applied
    }


def test_merge_sync_window_composes_with_other_guards(spark, tmp_path):
    """All three conditional clauses in ONE merge: matched guard,
    insert guard, and the conditional by-source delete — five row
    fates enumerated."""
    tdir = str(tmp_path / "compose")
    write_version(
        _mk(
            spark,
            [
                (1, 10, "keep"),   # matched, guard protects
                (2, 20, "upd"),    # matched, updates
                (3, 30, "old"),    # unmatched, stale → deleted
                (4, 40, "fresh"),  # unmatched, survives the window
            ],
            "k int, v int, s string",
        ).coalesce(1),
        tdir,
        "append",
    )
    src = _mk(
        spark,
        [(1, -1, "w"), (2, -2, "w"), (8, -8, "skip"), (9, -9, "new")],
        "k int, v int, s string",
    )
    merge_version(
        spark,
        tdir,
        src,
        "k",
        when_matched_condition="target.s <> 'keep'",
        when_not_matched_condition="source.s <> 'skip'",
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="target.s = 'old'",
    )
    got = {
        r["k"]: (r["v"], r["s"])
        for r in read_version(spark, tdir).collect()
    }
    assert got == {
        1: (10, "keep"),
        2: (-2, "w"),
        4: (40, "fresh"),
        9: (-9, "new"),
    }


def test_merge_sync_window_prunes_files(spark, tmp_path):
    """The condition's pruning groups join the zonemap cut: a file
    provably key-disjoint AND condition-empty is never rewritten —
    the manifest's dead_files (the touched set) excludes it."""
    import json
    import pathlib

    tdir = str(tmp_path / "prune")
    # file A: keys 0..9, all fresh (age 100) — disjoint from source
    # keys AND provably empty for "age < 50": must NOT rewrite
    write_version(
        _mk(spark, [(i, 100) for i in range(10)], "k int, age int")
        .coalesce(1),
        tdir,
        "append",
    )
    # file B: keys 100..109, stale — rewrites
    write_version(
        _mk(spark, [(100 + i, 10) for i in range(10)], "k int, age int")
        .coalesce(1),
        tdir,
        "append",
    )
    src = _mk(spark, [(100, 100)], "k int, age int")
    v = merge_version(
        spark,
        tdir,
        src,
        "k",
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="age < 50",
    )
    man = json.loads(
        (pathlib.Path(tdir) / "_manifests" / f"v{v:06d}.json").read_text()
    )
    # file B's dir rewrote wholesale (fully-dead dirs drop out of the
    # manifest); file A's dir survives UNREAD — the pruning proof
    dirs = man["dirs"]
    assert any("v000001" in d for d in dirs)
    assert not any("v000002" in d for d in dirs)
    got = {r["k"]: r["age"] for r in read_version(spark, tdir).collect()}
    assert got == {**{i: 100 for i in range(10)}, 100: 100}


def test_merge_sync_window_refusals(spark, tmp_path):
    tdir = str(tmp_path / "ref")
    write_version(
        _mk(spark, [(1, 10)], "k int, v int").coalesce(1), tdir, "append"
    )
    src = _mk(spark, [(1, 11)], "k int, v int")
    with pytest.raises(ValueError, match="requires when_not_matched_by_source"):
        merge_version(
            spark, tdir, src, "k",
            when_not_matched_by_source_condition="v < 0",
        )
    with pytest.raises(ValueError, match="requires.*_set"):
        merge_version(
            spark, tdir, src, "k", when_not_matched_by_source="update"
        )
    with pytest.raises(ValueError, match="only meaningful"):
        merge_version(
            spark, tdir, src, "k",
            when_not_matched_by_source_set={"v": "0"},
        )
    with pytest.raises(ValueError, match="non-deterministic"):
        merge_version(
            spark, tdir, src, "k",
            when_not_matched_by_source="delete",
            when_not_matched_by_source_condition="rand() < 0.5",
        )
    with pytest.raises(ValueError, match="merge key"):
        merge_version(
            spark, tdir, src, "k",
            when_not_matched_by_source="update",
            when_not_matched_by_source_set={"k": "0"},
        )


def test_sync_window_concurrency_conflicts(spark, tmp_path, monkeypatch):
    """Conflict detection knows the conditional clause: a winner
    append whose rows may match the sync-window condition conflicts
    even when key-disjoint; one provably outside BOTH the keys and
    the window retries clean."""
    tdir = str(tmp_path / "swcc")
    write_version(
        _mk(spark, [(i, 100) for i in range(10)], "k int, age int")
        .coalesce(1),
        tdir,
        "append",
    )
    src = _mk(spark, [(1, 100)], "k int, age int")

    def run(winner_rows):
        def winner():
            write_version(
                _mk(spark, winner_rows, "k int, age int").coalesce(1),
                tdir,
                "append",
            )

        _inject_winner(monkeypatch, winner)
        return merge_version(
            spark,
            tdir,
            src,
            "k",
            when_not_matched_by_source="delete",
            when_not_matched_by_source_condition="age < 50",
            commit_retries=2,
        )

    # key-disjoint AND fresh (age >= 50): provably unaffected → lands
    run([(500, 100)])
    got = {r["k"] for r in read_version(spark, tdir).collect()}
    assert got == set(range(10)) | {500}
    # key-disjoint but STALE: a re-run would delete it → refuses
    with pytest.raises(ConcurrentAppendError):
        run([(600, 10)])


def test_stream_read_versioned_max_bytes_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger (VERDICT r11 missing #5): the capped walk
    is costed in on-disk BYTES, so one fat commit fills a trigger
    that a file-count cap would let three thin ones share. Three
    single-file commits, byte budget sized to one file: with the
    cursor armed, each commit takes its own micro-batch even though
    maxFilesPerTrigger alone would admit them together."""
    import os
    import time

    from tms_etl_spark.operators.versioned import stream_read_versioned

    tdir = str(tmp_path / "tbl")
    write_version(
        _mk(spark, [(0, "x" * 2000)], "id int, pad string").coalesce(1),
        tdir,
        "append",
    )
    file_bytes = max(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(tdir)
        for f in fns
        if f.endswith(".parquet")
    )
    out = str(tmp_path / "out")
    q = (
        stream_read_versioned(
            spark, tdir, max_bytes_per_trigger=int(file_bytes * 1.5)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def poll(target):
        got: set = set()
        deadline = time.time() + 120
        while got != target and time.time() < deadline:
            time.sleep(1)
            try:
                got = {
                    r["id"] for r in spark.read.parquet(out).collect()
                }
            except Exception:
                got = set()
        return got

    try:
        assert poll({0}) == {0}  # batch 0: uncapped slack, one commit
        for i in (1, 2, 3):
            write_version(
                _mk(spark, [(i, "x" * 2000)], "id int, pad string")
                .coalesce(1),
                tdir,
                "append",
            )
        got = poll({0, 1, 2, 3})
    finally:
        q.stop()
    assert got == {0, 1, 2, 3}
    # byte granularity: each ~file-sized commit fills the 1.5-file
    # budget alone → three separate micro-batches for v2..v4
    commits = [
        f
        for f in os.listdir(str(tmp_path / "cp") + "/commits")
        if not f.startswith(".")
    ]
    assert len(commits) >= 4


def test_merge_refuses_concurrent_rollback(spark, tmp_path, monkeypatch):
    """Review regression (r12): rollback manifests record op as
    'rollback:<N>' — the conflict checker must match by prefix, or a
    retry could re-run on rewritten history."""
    from tms_etl_spark.operators.versioned import rollback

    tdir = _base_table(spark, tmp_path)
    write_version(
        _mk(spark, [(500, -1)], "k int, v int").coalesce(1),
        tdir,
        "append",
    )
    _inject_winner(monkeypatch, lambda: rollback(spark, tdir, 1))
    src = _mk(spark, [(1, 7777)], "k int, v int")
    with pytest.raises(ConcurrentOverwriteError, match="rollback"):
        merge_version(spark, tdir, src, "k", commit_retries=2)


def test_sync_window_literal_containing_target_not_mangled(
    spark, tmp_path
):
    """Review regression (r12): the pruning-side 'target.' strip must
    leave string LITERALS intact — a condition like
    ``note = 'target.ops'`` previously derived groups for
    ``note = 'ops'``, wrongly pruning a pure file whose rows PASS the
    real condition (its doomed rows silently survived)."""
    tdir = str(tmp_path / "lit")
    # one file, pure on note='target.ops' — the mangled literal would
    # prove it empty and skip the rewrite entirely
    write_version(
        _mk(
            spark,
            [(1, "target.ops"), (2, "target.ops")],
            "k int, note string",
        ).coalesce(1),
        tdir,
        "append",
    )
    src = _mk(spark, [(1, "keep")], "k int, note string")
    merge_version(
        spark,
        tdir,
        src,
        "k",
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="target.note = 'target.ops'",
    )
    got = {r["k"]: r["note"] for r in read_version(spark, tdir).collect()}
    assert got == {1: "keep"}  # k=2 matched the REAL condition: gone


def test_optimize_commit_retries_blind(spark, tmp_path, monkeypatch):
    """OPTIMIZE-family commit_retries is a BLIND re-run: compaction
    is row-preserving, so re-running against any winner's head is
    always safe — even a winner DELETE that would conflict a DML
    retry. The retried compaction lands and the table is exact."""
    from tms_etl_spark.operators.versioned import optimize_incremental

    tdir = str(tmp_path / "opt")
    for i in range(3):
        write_version(
            _mk(spark, [(i, i * 10)], "k int, v int").coalesce(1),
            tdir,
            "append",
        )

    def winner():
        delete_rows(spark, tdir, _mk(spark, [(1,)], "k int"))

    _inject_winner(monkeypatch, winner)
    v = optimize_incremental(
        spark, tdir, min_file_bytes=10**9, commit_retries=2
    )
    assert v == 5  # 3 appends, winner delete=4, retried compact=5
    got = _rows(spark, tdir)
    assert got == {0: 0, 2: 20}  # delete applied, then compacted away
    import json
    import pathlib

    man = json.loads(
        (pathlib.Path(tdir) / "_manifests" / "v000005.json").read_text()
    )
    assert "deletes" not in man  # the re-run purged the tombstone too


def test_import_daily_versioned_commit_retries(spark, tmp_path, monkeypatch):
    """The flagship pipeline passes commit_retries through: its merge
    survives a disjoint concurrent append (another writer's month)."""
    import pathlib

    from tms_etl_spark.operators.versioned import read_version
    from tms_etl_spark.tms.pipeline import import_daily_versioned

    def _row(data_turno, tear):
        head = [data_turno, tear, "ART", "", "G", "550", "85.5", "400", "40"]
        return ",".join(head + ["0"] * 56)

    lake = tmp_path / "lake" / "2024-01" / "daily"
    pathlib.Path(lake).mkdir(parents=True)
    (lake / "2024-01-05.csv").write_text(
        _row("2024-01-05.A", "00001"), encoding="utf-8"
    )
    tdir = str(tmp_path / "fact")
    import_daily_versioned(spark, str(tmp_path / "lake"), tdir)

    # second import loses its merge race to a disjoint append
    (lake / "2024-01-06.csv").write_text(
        _row("2024-01-06.A", "00001"), encoding="utf-8"
    )
    base = read_version(spark, tdir)

    def winner():
        write_version(
            base.limit(1)
            .withColumn("DataTurno", F.lit("2099-12-31.C"))
            .withColumn("month", F.lit("2099-12")),
            tdir,
            "append",
        )

    _inject_winner(monkeypatch, winner)
    stats = import_daily_versioned(
        spark, str(tmp_path / "lake"), tdir, commit_retries=2
    )
    assert stats.batch_rows == 2
    turnos = {
        r["DataTurno"] for r in read_version(spark, tdir).collect()
    }
    assert turnos == {"2024-01-05.A", "2024-01-06.A", "2099-12-31.C"}
