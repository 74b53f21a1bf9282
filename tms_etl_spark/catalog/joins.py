"""Join operators (SURVEY.md §2.3).

Strategy notes baked into each query:

- dimension chains broadcast (J4) — at 100 TB the fact side never
  shuffles for a dim join; `F.broadcast` makes the hint explicit even
  though AQE would usually pick it;
- semi/anti joins express the reference's existence-probe and
  dedup-against-target patterns as single distributed joins instead
  of per-row round-trips (/root/reference/src/main_01.py:235-269);
- the as-of join is the union+window form (one shuffle, no range
  explosion) from ``tms_etl_spark.operators.asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import dsum, sql_dsum
from tms_etl_spark.operators.asof import asof_join
from tms_etl_spark.sources.tables import load_table


@query(
    "join_broadcast_dim_chain",
    oracle=f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_orders,
           {sql_dsum("o.o_totalprice", "revenue")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5: fact→dim snowflake join, dims broadcast (reference:
    loom-registry enrichment, /root/reference/src/main_01.py:60-65).
    The fact table never shuffles: three broadcast hash joins then one
    partial-agg'd exchange on the tiny group key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left outer — customers with zero orders kept (count 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH a AS (SELECT user_id, COUNT(*) AS n_click FROM events
               WHERE event_type = 'click' GROUP BY user_id),
         b AS (SELECT user_id, COUNT(*) AS n_purchase FROM events
               WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.n_click, 0) AS n_click,
           COALESCE(b.n_purchase, 0) AS n_purchase
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: full outer join of two aggregates, null-coalesced."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_click"))
    )
    b = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchase"))
    )
    return a.join(b, "user_id", "full_outer").select(
        F.col("user_id"),
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(l.l_orderkey) AS n_lines
    FROM lineitem l RIGHT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: right outer (planner flips it to a left join of the small side)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey, "right")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J6: existence probe as one distributed left-semi join
    (reference: per-row COUNT(*) probe, /root/reference/src/main_01.py:242-246)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(big, "c_custkey", "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J6: dedup-against-target anti-join (reference:
    should_process_tear_desligado, /root/reference/src/main_01.py:460-473).
    The probe side is the filtered "large orders" set so the anti side
    is NON-EMPTY at every sf — a 0-row oracle match is false comfort
    (the round-1 rule; in this synthetic data every customer has at
    least one order, so the unfiltered form matched vacuously)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(big, "c_custkey", "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, t.l_returnflag, COUNT(*) AS n
    FROM region r CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) t
    GROUP BY r.r_name, t.l_returnflag
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: cartesian product of two tiny inputs (the only sane cross
    join shape at scale — anything larger must be a broadcast nested
    loop with a predicate, i.e. J7)."""
    r = load_table(spark, sf_dir, "region")
    flags = load_table(spark, sf_dir, "lineitem").select("l_returnflag").distinct()
    return (
        r.select("r_name")
        .crossJoin(flags)
        .groupBy("r_name", "l_returnflag")
        .agg(F.count("*").alias("n"))
    )


@query(
    "join_range_bands",
    oracle=f"""
    SELECT b.band_name, COUNT(*) AS n, {sql_dsum("l.l_extendedprice", "sum_price")}
    FROM lineitem l
    JOIN (VALUES ('p0_20k', 0.0, 20000.0),
                 ('p20_60k', 20000.0, 60000.0),
                 ('p60k_up', 60000.0, 1e12)) AS b(band_name, lo, hi)
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: theta/range join against a tiny band table — executes as a
    broadcast nested-loop join, the correct plan when the build side
    is rows-not-gigabytes. Large-large range joins should bucketize
    the range key first (see operators.asof for the as-of variant)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("p0_20k", 0.0, 20000.0), ("p20_60k", 20000.0, 60000.0), ("p60k_up", 60000.0, 1e12)],
        "band_name string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice", "sum_price"))
    )


@query(
    "join_asof",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, 1 AS side FROM events
        WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS side FROM events
        WHERE event_type = 'click'
    ), carried AS (
        SELECT user_id, ts, event_id, side,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_ts
        FROM tagged
    )
    SELECT event_id, user_id, ts, last_click_ts
    FROM carried WHERE side = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — for each purchase, the latest click at or
    before it, per user. Uses the engine's union+window operator
    (one shuffle; no range explosion)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], ts="ts", right_cols=["click_ts"], suffix=""
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("click_ts").alias("last_click_ts")
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, 1 AS side FROM events
        WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, 0 AS side
        FROM events WHERE event_type = 'purchase'
    ), carried AS (
        SELECT user_id, ts, event_id, side,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts DESC, side
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS matched_ts
        FROM tagged
    )
    SELECT event_id, user_id, ts,
           CASE WHEN matched_ts IS NOT NULL
                 AND matched_ts - ts <= INTERVAL 2 HOUR
                THEN matched_ts END AS next_purchase_ts
    FROM carried WHERE side = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (forward + tolerance): for each click, the EARLIEST purchase
    at or after it per user, nulled when it is more than 2 hours out —
    pandas merge_asof(direction='forward', tolerance=...) parity on
    the same single-shuffle union+window plan."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="ts",
        right_cols=["purchase_ts"],
        suffix="",
        direction="forward",
        tolerance="2 hours",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("purchase_ts").alias("next_purchase_ts")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, 1 AS side FROM events
        WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, 0 AS side
        FROM events WHERE event_type = 'click'
    ), carried AS (
        SELECT user_id, ts, event_id, side,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS b_ts,
               first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, side
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS f_ts
        FROM tagged
    )
    SELECT event_id, user_id, ts,
           CASE WHEN b_ts IS NOT NULL
                 AND (f_ts IS NULL OR ts - b_ts <= f_ts - ts)
                THEN b_ts ELSE f_ts END AS nearest_click_ts
    FROM carried WHERE side = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (nearest): for each purchase, the temporally CLOSEST click
    per user — backward on ties, pandas merge_asof
    (direction='nearest') parity. Both directional candidates come
    out of ONE key-partitioned sort (backward = last-ignorenulls over
    the preceding frame, forward = first-ignorenulls over the
    following frame of the same ascending order), so nearest costs
    the same single shuffle as a one-direction as-of."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        right_cols=["click_ts"],
        suffix="",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_ts").alias("nearest_click_ts"),
    )
