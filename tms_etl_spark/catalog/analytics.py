"""Composite analytics (SURVEY.md §3's "query lifecycle" shapes at
full size): classic shipping-priority and volume-by-region queries
(multi-join + agg + top-k in one plan) and an SCD2 temporal-table
derivation — the patterns a consumer of the fact table actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import sql_dsum8
from tms_etl_spark.sources.tables import load_table


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: segment filter → 3-way join → grouped revenue.
    Both filters push to their scans; the customer dim broadcasts;
    only the orders↔lineitem join shuffles."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(rev.cast("decimal(28,8)")), 4).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "q5_volume_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 5-way snowflake join, dims broadcast, one
    fact-fact shuffle (lineitem↔orders), tiny-key aggregation."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(rev.cast("decimal(28,8)")), 4).cast("double").alias("revenue"))
    )


@query(
    "scd2_customer_balance",
    oracle="""
    WITH snap AS (
        SELECT o_custkey, o_orderdate AS eff_from, o_totalprice AS attr,
               o_orderkey
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           strftime(eff_from, '%Y-%m-%d') AS eff_from,
           strftime(lead(eff_from) OVER (PARTITION BY o_custkey
                                          ORDER BY eff_from, o_orderkey),
                    '%Y-%m-%d') AS eff_to,
           (lead(eff_from) OVER (PARTITION BY o_custkey
                                 ORDER BY eff_from, o_orderkey) IS NULL)
             AS is_current
    FROM snap
    """,
)
def scd2_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 derivation (the CDC pattern MERGE-based warehouses need):
    each change record gets an effective interval [eff_from, eff_to)
    via lead() over the change sequence; open interval = current row.
    One shuffle on the business key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("eff_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("eff_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'signup' THEN ts END)
                 OVER (PARTITION BY user_id) AS t_signup
        FROM events
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_signup
                           THEN ts END)
                 OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ), s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
                           THEN ts END)
                 OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    )
    SELECT user_id,
           CAST(min(t_signup) AS TIMESTAMP) AS t_signup,
           CAST(min(t_click) AS TIMESTAMP) AS t_click,
           CAST(min(t_purchase) AS TIMESTAMP) AS t_purchase,
           CAST(CASE WHEN min(t_purchase) IS NOT NULL THEN 3
                     WHEN min(t_click) IS NOT NULL THEN 2
                     WHEN min(t_signup) IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS stage,
           date_diff('microsecond', min(t_signup), min(t_purchase))
             AS micros_to_convert
    FROM s3 GROUP BY user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (signup → click → purchase, each step
    strictly after the previous step's first occurrence): per user,
    the step timestamps, furthest stage reached, and conversion time
    in exact integer microseconds (no seconds-truncation ambiguity
    cross-engine). All step windows share one PARTITION BY user
    exchange and the final collapse groups on the same key
    (`operators/funnel.py:funnel`)."""
    from tms_etl_spark.operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, ["signup", "click", "purchase"])
