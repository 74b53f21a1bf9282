"""Data-quality expectations operator (operators/expectations.py):
single-pass profile metrics and the violation gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.operators.expectations import assert_expectations, profile


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 1, 10.0, "a"),
            (1, 1, 20.0, None),   # dup key (1,1); null tag
            (2, 1, -5.0, "b"),    # out of bounds
            (3, 2, 30.0, "c"),
            (3, 3, 200.0, "d"),   # out of bounds
        ],
        "k1 int, k2 int, v double, tag string",
    )


def test_profile_metrics(spark):
    m = {
        r["metric"]: r["value"]
        for r in profile(
            _frame(spark),
            null_cols=["tag", "v"],
            unique_keys=[["k1", "k2"]],
            bounds={"v": (0, 100)},
        ).collect()
    }
    assert m["n_rows"] == 5.0
    assert m["null_frac:tag"] == 1 / 5
    assert m["null_frac:v"] == 0.0
    assert m["dup_rows:k1+k2"] == 1.0  # (1,1) appears twice
    assert m["oob:v"] == 2.0  # -5 and 200


def test_profile_is_single_scan(spark):
    """The whole suite must compile to ONE aggregate over ONE scan —
    no per-metric re-scan (the property that makes it affordable at
    100 TB)."""
    df = _frame(spark)
    plan = (
        profile(df, null_cols=["tag"], unique_keys=[["k1"]], bounds={"v": (0, 1)})
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LocalRelation") + plan.count("Relation") <= 2
    assert "Union" not in plan  # not the UNION-of-scalar-queries shape


def test_assert_expectations_gate(spark):
    bad = assert_expectations(
        _frame(spark),
        null_cols=["tag"],
        unique_keys=[["k1", "k2"]],
        bounds={"v": (0, 100)},
    )
    kinds = {b.split("=")[0] for b in bad}
    assert kinds == {"null_frac:tag", "dup_rows:k1+k2", "oob:v"}

    clean = assert_expectations(
        _frame(spark).where(F.col("tag").isNotNull()),
        null_cols=["tag"],
    )
    assert clean == []


def test_custom_metric(spark):
    m = {
        r["metric"]: r["value"]
        for r in profile(
            _frame(spark),
            custom={"max_v": F.max("v"), "n_tags": F.count_distinct("tag")},
        ).collect()
    }
    assert m["max_v"] == 200.0 and m["n_tags"] == 4.0


def test_schema_drift_report(spark):
    from tms_etl_spark.operators.expectations import schema_drift

    old = spark.createDataFrame([(1, "a", 1.0)], "id long, s string, v double")
    new = spark.createDataFrame([(1, "a", 2, "x")], "id long, s string, v int, extra string")
    drift = schema_drift(old, new)
    by = {(d["column"], d["change"]) for d in drift}
    assert ("extra", "added") in by
    assert ("v", "type_changed") in by
    assert len(drift) == 2
    assert schema_drift(old, old) == []


def test_quarantine_split_covers_all_rows(spark):
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.expectations import quarantine_split

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id long, v double"
    )
    clean, bad = quarantine_split(df, F.col("v") >= 0)
    assert {r["id"] for r in clean.collect()} == {1}
    assert {r["id"] for r in bad.collect()} == {2, 3}  # null v quarantined
    assert clean.count() + bad.count() == df.count()
