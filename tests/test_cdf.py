"""Round-12 nets, part 2 — CHANGE DATA FEED (VERDICT r11 next-round
#2/#3): `enable_change_feed` makes MERGE/DELETE commits record a
change sidecar; `read_version_cdf` serves batch ranges and
`stream_read_version_changes` streams them as
``(row…, _change_type, _commit_version)`` micro-batches — MERGE and
DELETE become legal stream content instead of refusals. The plain
streaming source's initial snapshot is now DV-aware: deletion
vectors ship in the partition descriptors and are applied
executor-side, so a table that ran `delete_rows` starts a consumer
without an OPTIMIZE. Delta's CDF
(``delta.enableChangeDataFeed`` / ``readChangeFeed``) is the public
analog; the implementation is original over this engine's manifest
format."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    delete_rows,
    delete_where,
    enable_change_feed,
    merge_version,
    read_version,
    read_version_cdf,
    read_version_rowdiff,
    stream_read_version_changes,
    stream_read_versioned,
    write_version,
)


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _base(spark, tmp_path, name="t", feed=True):
    tdir = str(tmp_path / name)
    write_version(
        _mk(
            spark,
            [(i, i * 10, "x") for i in range(20)],
            "k int, v int, s string",
        ).coalesce(1),
        tdir,
        "append",
    )
    if feed:
        enable_change_feed(spark, tdir)
    return tdir


def _changes(spark, tdir, from_v, to_v=None):
    return sorted(
        tuple(r)
        for r in read_version_cdf(spark, tdir, from_v, to_v).collect()
    )


def _apply(log_rows):
    """Reconstruct a table from an ordered change log — what a
    downstream-apply consumer does: deletes remove the key,
    update_post/insert set it, update_pre is informational."""
    state: dict = {}
    for r in sorted(log_rows, key=lambda r: r["_commit_version"]):
        key = r["k"]
        if r["_change_type"] == "delete":
            state.pop(key, None)
        elif r["_change_type"] in ("insert", "update_post"):
            state[key] = (r["v"], r["s"])
    return state


def test_cdf_merge_changes_match_rowdiff(spark, tmp_path):
    """One MERGE (updates + a no-op rewrite + inserts): the CDF
    sidecar's insert/update_post rows equal `read_version_rowdiff`'s
    value-based feed (no-op rewrites classify out of BOTH), plus the
    pre-images rowdiff cannot give."""
    tdir = _base(spark, tmp_path)
    base_v = 2  # v1 data, v2 feed toggle
    src = _mk(
        spark,
        # k=1: update; k=2: NO-OP (same values); k=100: insert
        [(1, 999, "u"), (2, 20, "x"), (100, 1000, "n")],
        "k int, v int, s string",
    )
    merge_version(spark, tdir, src, "k")
    cdf = read_version_cdf(spark, tdir, base_v)
    by_type = {
        t: sorted(
            (r["k"], r["v"], r["s"])
            for r in cdf.where(F.col("_change_type") == t).collect()
        )
        for t in ("insert", "update_pre", "update_post", "delete")
    }
    assert by_type["insert"] == [(100, 1000, "n")]
    assert by_type["update_pre"] == [(1, 10, "x")]
    assert by_type["update_post"] == [(1, 999, "u")]
    assert by_type["delete"] == []  # the no-op k=2 classified out
    rd = read_version_rowdiff(spark, tdir, "k", base_v)
    rd_rows = {
        (r["op"], r["k"], r["v"], r["s"]) for r in rd.collect()
    }
    assert rd_rows == {
        ("insert", 100, 1000, "n"),
        ("update", 1, 999, "u"),
    }


def test_cdf_delete_records_preimages(spark, tmp_path):
    """delete_rows / delete_where record the deleted rows'
    pre-images; keys matching nothing emit nothing (value-based);
    already-deleted keys never re-emit."""
    tdir = _base(spark, tmp_path)
    v0 = 2
    delete_rows(spark, tdir, _mk(spark, [(3,), (4,), (777,)], "k int"))
    got = _changes(spark, tdir, v0)
    assert got == [
        (3, 30, "x", "delete", 3),
        (4, 40, "x", "delete", 3),
    ]
    # delete_where routes through the same sidecar
    delete_where(spark, tdir, "v >= 180", key="k")
    got = _changes(spark, tdir, 3)
    assert got == [
        (18, 180, "x", "delete", 4),
        (19, 190, "x", "delete", 4),
    ]
    # deleting an already-deleted key emits nothing
    delete_rows(spark, tdir, _mk(spark, [(3,)], "k int"))
    assert _changes(spark, tdir, 4) == []


def test_cdf_append_and_maintenance_steps(spark, tmp_path):
    """Appends serve their files as inserts with no sidecar;
    OPTIMIZE emits nothing (row-preserving — the tombstones it
    purges were already emitted by their own delete commits)."""
    from tms_etl_spark.operators.versioned import optimize_version

    tdir = _base(spark, tmp_path)
    v0 = 2
    write_version(
        _mk(spark, [(50, 500, "a")], "k int, v int, s string"),
        tdir,
        "append",
    )
    delete_rows(spark, tdir, _mk(spark, [(5,)], "k int"))
    optimize_version(spark, tdir)
    got = _changes(spark, tdir, v0)
    assert got == [
        (5, 50, "x", "delete", 4),
        (50, 500, "a", "insert", 3),
    ]
    # reconstruction across the whole feed equals the final table
    final = {
        r["k"]: (r["v"], r["s"])
        for r in read_version(spark, tdir).collect()
    }
    base = {i: (i * 10, "x") for i in range(20)}
    state = dict(base)
    for k, v, s, ct, _ver in got:
        if ct == "delete":
            state.pop(k, None)
        elif ct in ("insert", "update_post"):
            state[k] = (v, s)
    assert state == final


def test_cdf_refuses_pre_feed_dml(spark, tmp_path):
    """DML committed while the feed was OFF is unservable — the
    readers refuse that range loudly (enabling is not retroactive)."""
    tdir = _base(spark, tmp_path, feed=False)
    merge_version(
        spark,
        tdir,
        _mk(spark, [(1, -1, "z")], "k int, v int, s string"),
        "k",
    )
    enable_change_feed(spark, tdir)
    with pytest.raises(ValueError, match="feed was OFF"):
        read_version_cdf(spark, tdir, 1).collect()
    # ranges starting after the dark commit serve fine
    merge_version(
        spark,
        tdir,
        _mk(spark, [(1, -2, "z")], "k int, v int, s string"),
        "k",
    )
    got = _changes(spark, tdir, 3)
    assert sorted((r[0], r[1], r[3]) for r in got) == [
        (1, -2, "update_post"),
        (1, -1, "update_pre"),
    ]


def test_cdf_guarded_and_full_sync_changes(spark, tmp_path):
    """Conditional clauses shape the feed exactly like the merge:
    guard-kept rows emit nothing, full-sync unmatched rows emit
    deletes, insert-guard-failing rows emit nothing."""
    tdir = str(tmp_path / "g")
    write_version(
        _mk(
            spark,
            [(1, 10, "keep"), (2, 20, "upd"), (3, 30, "gone")],
            "k int, v int, s string",
        ).coalesce(1),
        tdir,
        "append",
    )
    enable_change_feed(spark, tdir)
    src = _mk(
        spark,
        [(1, -1, "w"), (2, -2, "w"), (9, -9, "new"), (8, -8, "skip")],
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
    )
    got = _changes(spark, tdir, 2)
    assert got == [
        (2, -2, "w", "update_post", 3),
        (2, 20, "upd", "update_pre", 3),
        (3, 30, "gone", "delete", 3),
        (9, -9, "new", "insert", 3),
    ]


def test_cdf_stream_reconstructs_and_resumes(spark, tmp_path):
    """Bronze→silver apply over the CDF STREAM: the drained change
    log reconstructs the table exactly across appends, a guarded
    MERGE, and a delete; a restart with the same checkpoint resumes
    mid-history with zero duplicate (version, type, key) events."""
    tdir = _base(spark, tmp_path)
    out = str(tmp_path / "log")
    cp = str(tmp_path / "cp")

    def drain():
        q = (
            stream_read_version_changes(spark, tdir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    write_version(
        _mk(spark, [(30, 300, "a")], "k int, v int, s string"),
        tdir,
        "append",
    )
    merge_version(
        spark,
        tdir,
        _mk(
            spark,
            [(0, -1, "guarded"), (1, 111, "u"), (40, 400, "i")],
            "k int, v int, s string",
        ),
        "k",
        when_matched_condition="target.k <> 0",
    )
    delete_rows(spark, tdir, _mk(spark, [(7,)], "k int"))
    log1 = drain()
    final = {
        r["k"]: (r["v"], r["s"])
        for r in read_version(spark, tdir).collect()
    }
    assert _apply(log1) == final
    # every pre-stream commit folds into the initial snapshot: all
    # rows arrive as inserts stamped with the snapshot's version
    from tms_etl_spark.operators.versioned import current_version

    snap_v = current_version(spark, tdir)
    assert log1 and all(
        r["_change_type"] == "insert"
        and r["_commit_version"] == snap_v
        for r in log1
    )

    # restart mid-history: new commits only, no duplicates
    merge_version(
        spark,
        tdir,
        _mk(spark, [(1, 222, "u2")], "k int, v int, s string"),
        "k",
    )
    delete_rows(spark, tdir, _mk(spark, [(30,)], "k int"))
    log2 = drain()
    events = [
        (r["_commit_version"], r["_change_type"], r["k"]) for r in log2
    ]
    assert len(events) == len(set(events))
    final2 = {
        r["k"]: (r["v"], r["s"])
        for r in read_version(spark, tdir).collect()
    }
    assert _apply(log2) == final2


def test_cdf_stream_snapshot_applies_tombstones(spark, tmp_path):
    """A CDF consumer starting on a table with ACTIVE deletion
    vectors gets the snapshot minus the deleted rows — no OPTIMIZE
    required, erased rows never reach the stream."""
    tdir = _base(spark, tmp_path)
    delete_rows(spark, tdir, _mk(spark, [(0,), (1,)], "k int"))
    out = str(tmp_path / "log")
    q = (
        stream_read_version_changes(spark, tdir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    ks = {r["k"] for r in rows}
    assert 0 not in ks and 1 not in ks
    assert ks == set(range(2, 20))
    assert all(r["_change_type"] == "insert" for r in rows)


def test_plain_stream_snapshot_is_dv_aware(spark, tmp_path):
    """VERDICT r11 #3: `stream_read_versioned`'s initial snapshot no
    longer refuses active deletion vectors — the tombstone keys ship
    in the partition descriptors and are anti-joined executor-side.
    Composite-key vectors included."""
    tdir = str(tmp_path / "dv")
    write_version(
        _mk(
            spark,
            [(i, i % 3, i * 10) for i in range(12)],
            "a int, b int, v int",
        ).coalesce(1),
        tdir,
        "append",
    )
    delete_rows(spark, tdir, _mk(spark, [(4, 1), (7, 1)], "a int, b int"))
    out = str(tmp_path / "out")
    q = (
        stream_read_versioned(spark, tdir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["a"], r["b"]) for r in spark.read.parquet(out).collect()}
    assert got == {(i, i % 3) for i in range(12)} - {(4, 1), (7, 1)}


def test_plain_stream_batch_spanning_append_and_delete(spark, tmp_path):
    """A micro-batch whose offset range spans an append AND a later
    tombstone on the appended rows applies the END manifest's
    vectors to the emitted files (under ignoreDeletes): rows deleted
    within the batch's own range never reach the stream."""
    tdir = str(tmp_path / "span")
    write_version(
        _mk(spark, [(1, "a")], "id int, v string").coalesce(1),
        tdir,
        "append",
    )
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def drain(**kw):
        q = (
            stream_read_versioned(spark, tdir, **kw)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            tuple(r) for r in spark.read.parquet(out).collect()
        )

    assert drain(ignore_deletes=True) == [(1, "a")]
    # append then delete one of the appended rows BEFORE the next poll
    write_version(
        _mk(spark, [(2, "b"), (3, "c")], "id int, v string").coalesce(1),
        tdir,
        "append",
    )
    delete_rows(spark, tdir, _mk(spark, [(3,)], "id int"))
    assert drain(ignore_deletes=True) == [(1, "a"), (2, "b")]


def test_stream_apply_changes_bronze_to_silver(spark, tmp_path):
    """The full downstream-apply pipeline: bronze (feed on) →
    `stream_read_version_changes` → `stream_apply_changes` → silver.
    Silver reconstructs bronze exactly across appends, a guarded
    MERGE, a delete, and a partial-sync merge; a second drain after
    more commits converges again (restart + exactly-once txn
    ledger)."""
    from tms_etl_spark.operators.versioned import stream_apply_changes

    bronze = _base(spark, tmp_path, name="bronze")
    silver = str(tmp_path / "silver")
    cp = str(tmp_path / "cp")

    def sync():
        q = stream_apply_changes(
            stream_read_version_changes(spark, bronze),
            silver,
            cp,
            key="k",
        )
        q.awaitTermination(180)

    def rows(tdir):
        return {
            r["k"]: (r["v"], r["s"])
            for r in read_version(spark, tdir).collect()
        }

    # wave 1: append + guarded merge + delete
    write_version(
        _mk(spark, [(30, 300, "a")], "k int, v int, s string"),
        bronze,
        "append",
    )
    merge_version(
        spark,
        bronze,
        _mk(
            spark,
            [(0, -1, "guarded"), (1, 111, "u"), (40, 400, "i")],
            "k int, v int, s string",
        ),
        "k",
        when_matched_condition="target.k <> 0",
    )
    delete_rows(spark, bronze, _mk(spark, [(7,)], "k int"))
    sync()
    assert rows(silver) == rows(bronze)

    # wave 2: partial-sync merge (conditional NOT MATCHED BY SOURCE)
    merge_version(
        spark,
        bronze,
        _mk(spark, [(1, 222, "u2")], "k int, v int, s string"),
        "k",
        when_not_matched_by_source="delete",
        when_not_matched_by_source_condition="target.v >= 300",
    )
    sync()
    assert rows(silver) == rows(bronze)


def test_dv_snapshot_subtracts_hive_partition_key(spark, tmp_path):
    """Review regression (r12): a deletion-vector key column that is
    a HIVE PARTITION column lives in the directory path, not the
    parquet footer — the executor-side subtraction must type the
    path constant through the vector's column type and still
    subtract, never silently emit the erased rows."""
    tdir = str(tmp_path / "hivedv")
    write_version(
        _mk(
            spark,
            [(i, i % 3, i * 10) for i in range(12)],
            "id int, part int, v int",
        ),
        tdir,
        "append",
        partition_by=["part"],
    )
    # composite key INCLUDING the partition column
    delete_rows(
        spark, tdir, _mk(spark, [(4, 1), (7, 1)], "id int, part int")
    )
    out = str(tmp_path / "out")
    q = (
        stream_read_versioned(spark, tdir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["part"]) for r in spark.read.parquet(out).collect()}
    assert got == {(i, i % 3) for i in range(12)} - {(4, 1), (7, 1)}
    # partition-column-ONLY key: the whole partition vanishes
    tdir2 = str(tmp_path / "hivedv2")
    write_version(
        _mk(
            spark,
            [(i, i % 3, i * 10) for i in range(12)],
            "id int, part int, v int",
        ),
        tdir2,
        "append",
        partition_by=["part"],
    )
    delete_rows(spark, tdir2, _mk(spark, [(2,)], "part int"))
    out2 = str(tmp_path / "out2")
    q2 = (
        stream_read_versioned(spark, tdir2)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {r["part"] for r in spark.read.parquet(out2).collect()}
    assert got2 == {0, 1}


def test_stream_apply_changes_with_map_column(spark, tmp_path):
    """Review regression (r12): the CDC-apply net-event pick orders
    by _commit_version alone — embedding the row payload in the sort
    key broke on non-orderable column types (maps)."""
    from tms_etl_spark.operators.versioned import stream_apply_changes

    bronze = str(tmp_path / "bronze")
    write_version(
        _mk(
            spark,
            [(1, {"a": 1}), (2, {"b": 2})],
            "k int, m map<string,int>",
        ).coalesce(1),
        bronze,
        "append",
    )
    enable_change_feed(spark, bronze)
    merge_version(
        spark,
        bronze,
        _mk(spark, [(1, {"a": 9}), (3, {"c": 3})], "k int, m map<string,int>"),
        "k",
    )
    delete_rows(spark, bronze, _mk(spark, [(2,)], "k int"))
    silver = str(tmp_path / "silver")
    q = stream_apply_changes(
        stream_read_version_changes(spark, bronze),
        silver,
        str(tmp_path / "cp"),
        key="k",
    )
    q.awaitTermination(180)
    got = {
        r["k"]: dict(r["m"]) for r in read_version(spark, silver).collect()
    }
    want = {
        r["k"]: dict(r["m"]) for r in read_version(spark, bronze).collect()
    }
    assert got == want == {1: {"a": 9}, 3: {"c": 3}}
