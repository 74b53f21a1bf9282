"""Round-13 nets, part 1 — the r12 ADVICE items outside the CDF seam
net (tests/test_cdf_seams.py covers that): `delete_rows` materializes
its key set ONCE and refuses NULL key components, the streaming
snapshot's executor-side tombstone subtraction mirrors the batch
anti-join's NULL semantics, DELETE WHERE retries test concurrent
appends against predicate OR key bounds, and the CLI's delete verbs
report named conflicts as refusals (exit 2) while contradictory
--sync flags refuse outright."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.__main__ import main
from tms_etl_spark.operators.versioned import (
    delete_rows,
    read_version,
    stream_read_versioned,
    write_version,
)


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_delete_rows_refuses_null_keys(spark, tmp_path):
    """A NULL key component can never equal a stored key — batch
    reads would silently no-op while the streaming snapshot's tuple
    subtraction would DROP the NULL-keyed row (ADVICE r12): refuse at
    the write, like delete_where documents."""
    tdir = str(tmp_path / "t")
    write_version(
        _mk(spark, [(1, 10), (2, 20)], "k int, v int"), tdir, "append"
    )
    with pytest.raises(ValueError, match="NULL"):
        delete_rows(
            spark, tdir, _mk(spark, [(1,), (None,)], "k int")
        )
    # nothing committed, no vector debris in the manifest
    assert read_version(spark, tdir).count() == 2


def test_delete_rows_bounds_cover_written_vector(spark, tmp_path):
    """Non-deterministic keys_df (rand-filtered): the recorded
    tombstone bounds must cover the rows of the vector that was
    ACTUALLY written — one localCheckpoint materialization feeds the
    write, the bounds aggregate, and the CDF pre-images (ADVICE r12;
    before, each re-evaluation could sample a different key set and
    record falsely-narrow bounds that let a concurrent retry prove a
    FALSE disjointness)."""
    tdir = str(tmp_path / "t")
    write_version(
        _mk(spark, [(i, i) for i in range(200)], "k int, v int"),
        tdir,
        "append",
    )
    keys = (
        spark.range(200)
        .select(F.col("id").cast("int").alias("k"))
        .where(F.rand() < 0.5)  # re-evaluation yields a different set
    )
    delete_rows(spark, tdir, keys)
    man = json.load(
        open(os.path.join(tdir, "_manifests", "v000002.json"))
    )
    de = man["deletes"][0]
    vec = spark.read.parquet(os.path.join(tdir, de["dir"]))
    lo, hi = vec.agg(F.min("k"), F.max("k")).head()
    assert de["bounds"]["k"] == [lo, hi]


def test_stream_snapshot_keeps_null_keyed_rows_like_batch(
    spark, tmp_path
):
    """A legacy deletion vector containing a NULL key (delete_rows
    refuses them NOW; simulate an old table by dropping a NULL-keyed
    parquet into the vector dir): the batch anti-join keeps the
    table's NULL-keyed row, and the streaming snapshot must agree —
    Python's None == None must not tombstone it (ADVICE r12)."""
    tdir = str(tmp_path / "t")
    write_version(
        _mk(
            spark,
            [(1, 10), (2, 20), (None, 99)],
            "k int, v int",
        ).coalesce(1),
        tdir,
        "append",
    )
    delete_rows(spark, tdir, _mk(spark, [(1,)], "k int"))
    man = json.load(
        open(os.path.join(tdir, "_manifests", "v000002.json"))
    )
    vdir = os.path.join(tdir, man["deletes"][0]["dir"])
    # legacy NULL-keyed vector row, written beside the real one
    _mk(spark, [(None,)], "k int").coalesce(1).write.mode(
        "append"
    ).parquet(vdir)
    key = lambda t: (t[0] is None, t[0] or 0)  # noqa: E731
    batch = sorted(
        ((r["k"], r["v"]) for r in read_version(spark, tdir).collect()),
        key=key,
    )
    assert batch == [(2, 20), (None, 99)]
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
    got = sorted(
        ((r["k"], r["v"]) for r in spark.read.parquet(out).collect()),
        key=key,
    )
    assert got == batch


def test_cli_merge_refuses_contradictory_sync_flags(
    spark, tmp_path, capsys
):
    """--sync-update-set + --sync-delete-unmatched is a contradiction
    (update XOR delete the unmatched rows) — exit 2, no commit
    (ADVICE r12: it silently resolved to update)."""
    tdir = str(tmp_path / "t")
    srcdir = str(tmp_path / "src")
    write_version(
        _mk(spark, [(1, 10)], "k int, v int"), tdir, "append"
    )
    _mk(spark, [(1, 11)], "k int, v int").write.parquet(srcdir)
    rc = main(
        [
            "table", "merge", tdir,
            "--source", srcdir,
            "--key", "k",
            "--sync-update-set", "v=0",
            "--sync-delete-unmatched",
        ]
    )
    assert rc == 2
    assert "mutually exclusive" in capsys.readouterr().err
    assert read_version(spark, tdir).head()["v"] == 10  # unchanged


def test_cli_delete_named_conflict_exits_2(
    spark, tmp_path, capsys, monkeypatch
):
    """CLI delete surfaces NAMED conflicts as 'refused: …' + exit 2
    like the merge verb — never a raw traceback (ADVICE r12). Pinned
    for both --values (delete_rows) and --where (delete_where)."""
    import tms_etl_spark.operators.versioned as vt

    tdir = str(tmp_path / "t")
    write_version(
        _mk(spark, [(1, 10)], "k int, v int"), tdir, "append"
    )

    def boom(*a, **kw):
        raise vt.ConcurrentAppendError("simulated losing race")

    monkeypatch.setattr(vt, "delete_rows", boom)
    rc = main(
        ["table", "delete", tdir, "--key", "k", "--values", "1"]
    )
    assert rc == 2
    assert "refused: simulated" in capsys.readouterr().err
    monkeypatch.setattr(vt, "delete_where", boom)
    rc = main(
        ["table", "delete", tdir, "--key", "k", "--where", "v = 10"]
    )
    assert rc == 2
    assert "refused: simulated" in capsys.readouterr().err


def test_delete_where_retry_append_test_uses_either(spark, tmp_path):
    """The DELETE WHERE retry context ships append_test='either':
    a concurrently appended file is tested against the predicate's
    pruning groups OR the matched-key bounds (ADVICE r12 — under
    allow_key_scope=True a key-sharing, predicate-failing appended
    row WOULD be tombstoned by a re-run). Pinned structurally via the
    retry ctx the losing verb attaches."""
    import tms_etl_spark.operators.versioned as vt

    tdir = str(tmp_path / "t")
    write_version(
        _mk(spark, [(i, i) for i in range(10)], "k int, v int"),
        tdir,
        "append",
    )
    captured: dict = {}
    orig = vt._write_json_atomic

    def racing(spark_, path, payload):
        # first manifest write of the delete loses a race: another
        # writer appends a key-overlapping, predicate-FAILING file
        if "v000002" in path and not captured:
            captured["raced"] = True
            write_version(
                _mk(spark, [(3, 777)], "k int, v int"), tdir, "append"
            )
        return orig(spark_, path, payload)

    vt._write_json_atomic = racing
    try:
        with pytest.raises(vt.ConcurrentAppendError):
            vt.delete_where(
                spark,
                tdir,
                "v <= 5",
                "k",
                allow_key_scope=True,
                commit_retries=3,
            )
    finally:
        vt._write_json_atomic = orig
    assert captured.get("raced")
