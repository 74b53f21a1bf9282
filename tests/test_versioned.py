"""Versioned-table layer: append/overwrite commits, time travel,
non-destructive rollback, atomic manifest protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    current_version,
    history,
    read_version,
    rollback,
    write_version,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "vtable")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )


def test_append_accumulates_and_time_travel(spark, tdir):
    assert current_version(spark, tdir) == 0
    assert write_version(_df(spark, 0, 5), tdir, "append") == 1
    assert write_version(_df(spark, 5, 8), tdir, "append") == 2
    assert read_version(spark, tdir).count() == 8
    # time travel to v1
    assert read_version(spark, tdir, 1).count() == 5
    assert current_version(spark, tdir) == 2


def test_overwrite_resets_but_keeps_history(spark, tdir):
    write_version(_df(spark, 0, 5), tdir, "append")
    write_version(_df(spark, 100, 102), tdir, "overwrite")
    assert read_version(spark, tdir).count() == 2
    assert {r["id"] for r in read_version(spark, tdir).collect()} == {100, 101}
    # the overwritten version is still readable
    assert read_version(spark, tdir, 1).count() == 5


def test_rollback_is_nondestructive(spark, tdir):
    write_version(_df(spark, 0, 5), tdir, "append")
    write_version(_df(spark, 5, 9), tdir, "append")
    v = rollback(spark, tdir, 1)
    assert v == 3
    assert read_version(spark, tdir).count() == 5
    # the rolled-back-over state is still reachable
    assert read_version(spark, tdir, 2).count() == 9
    ops = [h.op for h in history(spark, tdir)]
    assert ops == ["append", "append", "rollback:1"]


def test_no_torn_manifests(spark, tdir):
    """Only fully-committed (renamed) manifests count: a leftover
    .tmp file must not advance the version."""
    write_version(_df(spark, 0, 3), tdir, "append")
    # simulate a torn commit: v2 tmp exists but rename never happened
    import pathlib

    man_dir = pathlib.Path(tdir) / "_manifests"
    (man_dir / "v000002.json.tmp").write_text("{}")
    assert current_version(spark, tdir) == 1
    assert read_version(spark, tdir).count() == 3


def test_rollback_bounds(spark, tdir):
    write_version(_df(spark, 0, 3), tdir, "append")
    with pytest.raises(ValueError):
        rollback(spark, tdir, 5)
    with pytest.raises(ValueError):
        read_version(spark, tdir, 0)
