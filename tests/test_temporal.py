"""Semantic pins for the temporal family (catalog/temporal.py):
linear attribution credit math, trapezoidal TWA, MAD anomaly gates,
seasonal-naive error. Cross-engine values are covered by the oracle
sweep; these verify the *models* on planted inputs."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _attr(spark, df):
    """Run the attribution pipeline on an in-memory events frame
    (mirrors catalog.temporal.attribution_linear without the loader)."""
    p = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), "value",
    )
    t = df.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(t, "user_id").where(F.col("t_ts") < F.col("p_ts"))
    w = Window.partitionBy("user_id", "p_id")
    j = j.withColumn("n_touch", F.count("*").over(w))
    return j.groupBy("channel").agg(
        F.round(
            F.sum((F.col("value") / F.col("n_touch")).cast("decimal(28,8)")), 4
        ).cast("double").alias("total_credit"),
        F.countDistinct("p_id").cast("long").alias("n_conversions"),
    )


def test_attribution_splits_credit_equally(spark):
    ev = _events(spark, [
        (1, _ts(1), 7, "view", 0.0),
        (2, _ts(2), 7, "click", 0.0),
        (3, _ts(3), 7, "purchase", 10.0),
        # a purchase with no prior touches attributes nothing
        (4, _ts(1), 8, "purchase", 99.0),
        # touches AFTER the purchase don't count
        (5, _ts(4), 7, "view", 0.0),
    ])
    got = {r["channel"]: r for r in _attr(spark, ev).collect()}
    assert got["view"]["total_credit"] == 5.0
    assert got["click"]["total_credit"] == 5.0
    assert got["view"]["n_conversions"] == 1


def test_attribution_multiple_conversions_accumulate(spark):
    ev = _events(spark, [
        (1, _ts(1), 7, "view", 0.0),
        (2, _ts(2), 7, "purchase", 6.0),
        (3, _ts(3), 7, "click", 0.0),
        (4, _ts(4), 7, "purchase", 8.0),
    ])
    got = {r["channel"]: r for r in _attr(spark, ev).collect()}
    # purchase 1: only the view -> 6.  purchase 2: view+click -> 4 each
    assert got["view"]["total_credit"] == 10.0
    assert got["click"]["total_credit"] == 4.0


def test_time_weighted_avg_sane_over_real_data(spark, sf_dir):
    from tms_etl_spark.catalog import load_all, QUERIES

    load_all()
    rows = QUERIES["ts_time_weighted_avg"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_segments"] >= 1
        assert not math.isnan(r["twa"])
        # TWA of nonnegative bounded values stays within their range
        assert -1e-9 <= r["twa"] <= 1000.0


def test_twa_replays_python_formula(spark, sf_dir):
    """Bit-level replay of one user's TWA from the raw events."""
    from tms_etl_spark.catalog import load_all, QUERIES
    from tms_etl_spark.sources.tables import load_table

    load_all()
    got = {
        r["user_id"]: (r["twa"], r["n_segments"])
        for r in QUERIES["ts_time_weighted_avg"](spark, sf_dir).collect()
    }
    uid = sorted(got)[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .where((F.col("event_type") == "view") & (F.col("user_id") == uid))
        .select("ts", "value", "event_id")
        .collect()
    )
    pts = sorted((r["ts"], r["event_id"], r["value"]) for r in ev)
    from decimal import ROUND_HALF_UP, Decimal

    def d8(x):  # Spark's double -> DECIMAL(28,8) cast (HALF_UP)
        return Decimal(x).quantize(Decimal("1E-8"), rounding=ROUND_HALF_UP)

    wvd = dtd = Decimal(0)
    for (t1, _, v1), (t2, _, v2) in zip(pts, pts[1:]):
        us = (t2 - t1).total_seconds()
        wvd += d8((v1 + v2) / 2.0 * us)
        dtd += d8(us)
    q2 = lambda d: d.quantize(Decimal("1E-2"), rounding=ROUND_HALF_UP)
    expect = float(q2(wvd)) / float(q2(dtd))
    assert got[uid][1] == len(pts) - 1
    assert got[uid][0] == expect


def test_mad_flags_planted_outlier(spark):
    """14 days of ~100 events plus one 500-count day: only the spike
    is flagged."""
    rows = []
    eid = 0
    for day in range(1, 15):
        n = 500 if day == 7 else (100 + (day % 3))
        for i in range(n):
            rows.append((eid, _ts(day, i // 60 % 24, i % 60), 1, "view", 0.0))
            eid += 1
    ev = _events(spark, rows)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("cnt"), F.lit(0.5)).alias("med")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("cnt") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    out = (
        daily.join(med, "event_type").join(mad, "event_type")
        .where(F.abs(F.col("cnt") - F.col("med")) > F.lit(3.0) * F.col("mad"))
        .collect()
    )
    assert len(out) == 1
    assert out[0]["cnt"] == 500


def test_seasonal_naive_error_exact_on_planted_series(spark):
    """Counts 10,...,10 then week 2 all 13 -> |err|=3 on each of the
    7 matched days; MAE=3, sMAPE = 3/11.5."""
    rows = []
    eid = 0
    for day in range(1, 15):
        n = 10 if day <= 7 else 13
        for i in range(n):
            rows.append((eid, _ts(day, 1, i), 1, "view", 0.0))
            eid += 1
    ev = _events(spark, rows)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    f = daily.select(
        "event_type", (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("cnt").alias("fc"),
    )
    j = daily.join(f, ["event_type", "day"])
    got = j.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (F.sum(F.abs(F.col("cnt") - F.col("fc"))).cast("double") / F.count("*")).alias("mae"),
    ).collect()[0]
    assert got["n_days"] == 7
    assert got["mae"] == 3.0


def test_position_attribution_u_shape(spark):
    """3 touches -> 0.4 / 0.2 / 0.4; 1 touch -> 1.0; 2 -> 0.5/0.5."""
    from pyspark.sql import Window

    ev = _events(spark, [
        (1, _ts(1), 7, "view", 0.0),     # first (0.4)
        (2, _ts(2), 7, "click", 0.0),    # middle (0.2)
        (3, _ts(3), 7, "view", 0.0),     # last (0.4)
        (4, _ts(4), 7, "purchase", 10.0),
        (5, _ts(1), 8, "click", 0.0),
        (6, _ts(2), 8, "purchase", 8.0),
    ])
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), "value")
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"), F.col("event_type").alias("channel"))
    j = p.join(t, "user_id").where(F.col("t_ts") < F.col("p_ts"))
    wc = Window.partitionBy("user_id", "p_id")
    wr = Window.partitionBy("user_id", "p_id").orderBy("t_ts", "t_id")
    j = j.withColumn("n", F.count("*").over(wc)).withColumn(
        "rn", F.row_number().over(wr))
    frac = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rn") == 1, F.lit(0.4))
        .when(F.col("rn") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2)))
    got = {
        r["channel"]: r["c"]
        for r in j.select("channel", (F.col("value") * frac).alias("credit"))
        .groupBy("channel").agg(F.sum("credit").alias("c")).collect()
    }
    # user 7: view gets 4 (first) + 4 (last), click gets 2 (middle)
    # user 8: single click touch gets all 8
    assert math.isclose(got["view"], 8.0)
    assert math.isclose(got["click"], 10.0)


def test_attribution_total_credit_conserved(spark, sf_dir):
    """Both attribution models distribute exactly the attributed
    purchases' total value (conversions with >=1 prior touch)."""
    from tms_etl_spark.catalog import QUERIES, load_all

    load_all()
    lin = QUERIES["attribution_linear"](spark, sf_dir).collect()
    pos = QUERIES["attribution_position"](spark, sf_dir).collect()
    t_lin = sum(r["total_credit"] for r in lin)
    t_pos = sum(r["total_credit"] for r in pos)
    assert math.isclose(t_lin, t_pos, rel_tol=0, abs_tol=0.02)
