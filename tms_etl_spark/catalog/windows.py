"""Window functions (SURVEY.md §2.5): ranking, lag/lead, frames.

All queries shuffle once on the partition key then stay in a single
window stage. Running sums go through DECIMAL (see catalog.exact) so
the frame accumulation is order-exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import dec
from tms_etl_spark.operators.windows import latest_per_key, topk_per_group
from tms_etl_spark.sources.tables import load_table


@query(
    "window_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, ts FROM (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: latest row per key (reference: last-log-line scan,
    /root/reference/src/main_01.py:1022-1037)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(
        ev.select("user_id", "event_id", "event_type", "ts"),
        keys=["user_id"],
        order=[F.desc("ts"), F.desc("event_id")],
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
           row_number() OVER (PARTITION BY s_nationkey
                              ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
    FROM supplier
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: rank / dense_rank / row_number (row_number carries a unique
    tie-break; rank & dense_rank are tie-stable by definition)."""
    s = load_table(spark, sf_dir, "supplier")
    by_bal = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    by_bal_uniq = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        # cast to long: Spark's rank family yields int32, DuckDB's
        # int64 — keep the driver's schema comparison unambiguous
        F.rank().over(by_bal).cast("long").alias("rnk"),
        F.dense_rank().over(by_bal).cast("long").alias("drnk"),
        F.row_number().over(by_bal_uniq).cast("long").alias("rn"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: shift-over-shift delta (the natural query on the
    reference's (tear, dataTurno) series, SURVEY.md §2.5)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_rolling_range",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h
    FROM events
    """,
)
def window_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: rolling time-range frame (reference: pervasive 30-day
    windows, /root/reference/src/main_01.py:140,1120,1386) — here a
    1-hour rolling sum per user over event seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("rolling_1h"),
    )


@query(
    "window_cumulative",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM events
    """,
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: cumulative total (decimal-exact, so the running value is
    identical however the frame is evaluated)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_total"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k per group via the engine operator (reference: top-2
    months per kind, /root/reference/src/main_02.py:226-232)."""
    o = load_table(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: calendar-interval range frame (the reference's rolling
    30-day windows, /root/reference/src/main_01.py:1120) directly on
    the timestamp ordering column — no epoch conversion."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS spend_30d
        FROM orders
        """
    )


@query(
    "topk_per_group_bounded",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey DESC,
                            l_linenumber DESC
               ) AS rn
        FROM lineitem
    )
    SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
    FROM r WHERE rn <= 3
    """,
)
def topk_per_group_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest lineitems per return flag via the BUFFER-BOUNDED
    two-phase aggregate (`operators/windows.py:grouped_topk_agg`) —
    per-task state is a k-slice, so a 10^9-row hot group degrades
    into partial-aggregation work instead of a single-task window
    sort. The oracle is the window form; both carry the full
    (price, orderkey, linenumber) descending tie-break so the kept
    SET is well-defined."""
    from tms_etl_spark.operators.windows import grouped_topk_agg

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_topk_agg(
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        ["l_returnflag"],
        "l_extendedprice",
        3,
        ["l_orderkey", "l_linenumber"],
    )
