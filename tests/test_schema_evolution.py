"""Schema evolution on versioned tables: the manifest records the
schema AS OF each version, appends may add/drop columns only under
``merge_schema=True``, type changes always refuse, and reads
null-fill deterministically (old files for added columns, new files
for dropped ones). Time travel returns the HISTORICAL shape.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    read_version,
    read_version_pruned,
    write_version,
    write_version_checked,
)
from tms_etl_spark.operators.versioned import ExpectationViolation


def test_append_same_columns_any_order(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, "a")], "k int, s string"), tdir
    )
    # column order differs; names/types match — no evolution needed
    write_version(
        spark.createDataFrame([("b", 2)], "s string, k int"), tdir
    )
    got = read_version(spark, tdir)
    assert got.columns == ["k", "s"]
    assert sorted(got.collect()) == [(1, "a"), (2, "b")]


def test_added_column_requires_flag(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), tdir)
    with pytest.raises(ValueError, match="merge_schema"):
        write_version(
            spark.createDataFrame(
                [(2, "b", 9.0)], "k int, s string, score double"
            ),
            tdir,
        )


def test_added_column_null_fills_old_rows(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), tdir)
    write_version(
        spark.createDataFrame(
            [(2, "b", 9.0)], "k int, s string, score double"
        ),
        tdir,
        merge_schema=True,
    )
    got = read_version(spark, tdir)
    assert got.columns == ["k", "s", "score"]
    by_k = {r["k"]: r for r in got.collect()}
    assert by_k[1]["score"] is None
    assert by_k[2]["score"] == 9.0


def test_dropped_column_null_fills_new_rows(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, "a", 5.0)], "k int, s string, score double"),
        tdir,
    )
    write_version(
        spark.createDataFrame([(2, "b")], "k int, s string"),
        tdir,
        merge_schema=True,
    )
    got = read_version(spark, tdir)
    assert got.columns == ["k", "s", "score"]
    by_k = {r["k"]: r for r in got.collect()}
    assert by_k[1]["score"] == 5.0
    assert by_k[2]["score"] is None


def test_type_change_always_refused(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), tdir)
    with pytest.raises(ValueError, match="type change"):
        write_version(
            spark.createDataFrame([(2.0, "b")], "k double, s string"),
            tdir,
            merge_schema=True,
        )


def test_time_travel_has_historical_schema(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), tdir)
    write_version(
        spark.createDataFrame([(2, "b", 9.0)], "k int, s string, score double"),
        tdir,
        merge_schema=True,
    )
    v1 = read_version(spark, tdir, version=1)
    assert v1.columns == ["k", "s"]  # schema AS OF v1 — no score
    assert read_version(spark, tdir).columns == ["k", "s", "score"]


def test_pruned_read_on_evolved_table(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(
        spark.createDataFrame(
            [(i, "old") for i in range(50)], "k int, s string"
        ).repartitionByRange(4, "k"),
        tdir,
    )
    write_version(
        spark.createDataFrame(
            [(100 + i, "new", 1.0) for i in range(50)],
            "k int, s string, score double",
        ).repartitionByRange(4, "k"),
        tdir,
        merge_schema=True,
    )
    got = read_version_pruned(spark, tdir, "k", ">=", 100)
    assert got.count() == 50
    assert got.columns == ["k", "s", "score"]
    # zonemap pruning still skips the old ranged files
    assert len(got.inputFiles()) <= 4


def test_checked_evolve_policy_flows_through(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version_checked(
        spark.createDataFrame([(1, "a")], "k int, s string"), tdir
    )
    with pytest.raises(ExpectationViolation):
        write_version_checked(
            spark.createDataFrame(
                [(2, "b", 9.0)], "k int, s string, score double"
            ),
            tdir,
            schema_policy="strict",
        )
    write_version_checked(
        spark.createDataFrame(
            [(2, "b", 9.0)], "k int, s string, score double"
        ),
        tdir,
        schema_policy="evolve",
    )
    assert read_version(spark, tdir).columns == ["k", "s", "score"]


def test_evolution_then_partitioned(spark, tmp_path):
    """Evolution composes with hive partitioning: the recorded schema
    (with the added column) is applied per hive dir via basePath."""
    tdir = str(tmp_path / "t")
    write_version(
        spark.createDataFrame([(1, "A")], "k int, seg string"),
        tdir,
        partition_by=["seg"],
    )
    write_version(
        spark.createDataFrame([(2, "B", 3.0)], "k int, seg string, v double"),
        tdir,
        merge_schema=True,
    )
    got = read_version(spark, tdir)
    assert got.columns == ["k", "seg", "v"]
    by_k = {r["k"]: r for r in got.collect()}
    assert by_k[1]["seg"] == "A" and by_k[1]["v"] is None
    assert by_k[2]["seg"] == "B" and by_k[2]["v"] == 3.0
