"""Incremental view maintenance: merged partial states must equal a
full recompute, including the negated-delta (delete) encoding."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.operators.ivm import (
    aggregate_states,
    finalize,
    merge_states,
)


def _rows(df):
    return {
        tuple(r[k] for k in ("k", "n", "total", "avg"))
        for r in df.collect()
    }


def test_merge_equals_full_recompute(spark):
    raw = spark.createDataFrame(
        [(i % 5, float(i)) for i in range(1000)], "k long, v double"
    )
    base = aggregate_states(raw.where(F.col("v") < 600), ["k"], "v")
    delta = aggregate_states(raw.where(F.col("v") >= 600), ["k"], "v")
    merged = finalize(merge_states(base, delta, ["k"]), ["k"])
    full = finalize(aggregate_states(raw, ["k"], "v"), ["k"])
    assert _rows(merged) == _rows(full)


def test_negated_delta_retracts_rows(spark):
    raw = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], "k long, v double"
    )
    wrong = raw.union(
        spark.createDataFrame([(0, 1e6)], "k long, v double")
    )
    base = aggregate_states(wrong, ["k"], "v")
    # retract the bad row: cnt −1, sum −x; min/max carry the original
    # row's values (monoid retraction is exact for cnt/sum only — the
    # caller re-derives min/max when retractions touch extremes)
    retract = spark.createDataFrame(
        [(0, -1, -1e6, 1e6, 1e6)],
        "k long, cnt long, sum double, min double, max double",
    ).withColumn("sum", F.col("sum").cast("decimal(18,4)"))
    merged = merge_states(base, retract, ["k"])
    clean = aggregate_states(raw, ["k"], "v")
    got = {
        (r["k"], r["cnt"], float(r["sum"]))
        for r in merged.select("k", "cnt", "sum").collect()
    }
    want = {
        (r["k"], r["cnt"], float(r["sum"]))
        for r in clean.select("k", "cnt", "sum").collect()
    }
    assert got == want
