"""Time-series resample / gap-fill / forward-fill operator tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tms_etl_spark.operators.resample import fill_gaps, resample


def _hours(spark):
    t = lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
    return spark.createDataFrame(
        [
            ("a", t(0), 1.0),
            ("a", t(0), 2.0),   # same bucket
            ("a", t(3), 30.0),  # hours 1-2 missing
            ("b", t(5), 5.0),   # b's span is just one bucket
        ],
        "k string, ts timestamp, v double",
    )


def test_resample_buckets(spark):
    got = {
        (r["k"], r["bucket_start"].hour): (r["n"], r["sv"])
        for r in resample(
            _hours(spark),
            ["k"],
            "ts",
            "1 hour",
            [F.count("*").alias("n"), F.sum("v").alias("sv")],
        ).collect()
    }
    assert got == {("a", 0): (2, 3.0), ("a", 3): (1, 30.0), ("b", 5): (1, 5.0)}


def test_fill_gaps_per_key_span_and_ffill(spark):
    hourly = resample(
        _hours(spark),
        ["k"],
        "ts",
        "1 hour",
        [F.count("*").alias("n"), F.sum("v").alias("sv")],
    )
    full = fill_gaps(hourly, ["k"], "bucket_start", "1 hour", ffill_cols=["sv"])
    rows = {
        (r["k"], r["bucket_start"].hour): (r["n"], r["sv"])
        for r in full.collect()
    }
    # a: hours 0..3 materialized (its own span); gaps carry sv forward
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 1)] == (None, 3.0)  # generated row, ffilled
    assert rows[("a", 2)] == (None, 3.0)
    assert rows[("a", 3)] == (1, 30.0)
    # b: span is a single bucket — no rows invented outside its life
    assert [k for k in rows if k[0] == "b"] == [("b", 5)]
    assert len(rows) == 5
