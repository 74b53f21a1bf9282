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


@query(
    "q6_revenue_change",
    oracle=f"""
    SELECT {sql_dsum8("l_extendedprice * l_discount", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan-side query — every predicate pushes
    into the parquet scan (shipdate range + discount band + quantity
    cap), one map-side-combined global aggregate, zero joins. At
    100 TB this is the query that proves predicate pushdown works:
    the scan should read 4 columns and skip every row group whose
    shipdate stats miss the year."""
    from tms_etl_spark.catalog.exact import dsum8

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum8(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape (returned-item reporting): half-year order
    window, returnflag filter on the fact, customer+nation dims
    broadcast, one orders↔lineitem shuffle, exact-decimal revenue,
    top-20 with a unique c_custkey tie-break (TakeOrdered — no global
    sort materialization)."""
    from tms_etl_spark.catalog.exact import dsum8

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum8(rev, "revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape (large-volume orders): the HAVING pre-aggregate
    runs map-side-combined on the fact FIRST, shrinking it by ~100×
    before any join — then the surviving keys join orders (shuffle)
    and broadcast-enrich with customer. The anti-pattern at 100 TB is
    joining first and filtering later; this plan never moves a
    non-qualifying lineitem row past its first shuffle."""
    from tms_etl_spark.catalog.exact import dec, dsum

    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


@query(
    "ml_linear_fit_per_group",
    oracle="""
    WITH s AS (
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
               CAST(ROUND(SUM(CAST(l_quantity * l_extendedprice
                             AS DECIMAL(28,8))), 2) AS DOUBLE) AS sxy,
               CAST(ROUND(SUM(CAST(l_quantity * l_quantity
                             AS DECIMAL(28,8))), 0) AS DOUBLE) AS sxx,
               CAST(ROUND(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(28,8))), 1) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, n, sx, sy,
           ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope,
           (sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx)
             / n AS intercept,
           ((n * sxy) - (sx * sy))
             / (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy)))
             AS corr
    FROM s
    """,
)
def ml_linear_fit_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-group OLS (y = price, x = quantity, one model
    per supplier) via the closed form — a grouped aggregation, NOT an
    iterative solver: one map-side-combined pass computes the five
    sufficient statistics per group, and slope/intercept/correlation
    are pure driver-free arithmetic on them. Exactness: each sum is
    decimal-exact (order-independent) and rounded in decimal space
    to a scale keeping ``value × 10^scale ≤ 2^53`` (sxy→2, sxx→0,
    syy→1 — squared prices reach ~1e13 at sf0.01) so every
    decimal→double cast is one correctly-rounded conversion on both
    engines; the final formulas are then evaluated in IEEE double with
    identical operand values and identical parse trees, so the
    quotients are bit-identical. Scales as one shuffle on the group key regardless
    of rows per group."""
    from tms_etl_spark.catalog.exact import dsum, dsum8r

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum8r(x * y, "sxy", 2),
        dsum8r(x * x, "sxx", 0),
        dsum8r(y * y, "syy", 1),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))
    return s.select(
        "l_suppkey",
        "n",
        "sx",
        "sy",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            ((n * sxy) - (sx * sy))
            / (F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy)))
        ).alias("corr"),
    )


@query(
    "events_sessionize",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts)
                       > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS session_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(session_start AS INTEGER) AS session_start,
           CAST(SUM(session_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_seq
    FROM s
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization (30-minute inactivity gap): every
    event keeps its row and gains (session_start flag, per-user
    session ordinal) — the labeled shape per-session feature joins
    consume, complementing the windowed-aggregate session form
    (stream_session_window). Lag + running-sum share one PARTITION BY
    user exchange (`operators/funnel.py:sessionize`)."""
    from tms_etl_spark.operators.funnel import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30)


@query(
    "ivm_incremental_agg",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg,
           MIN(o_totalprice) AS min,
           MAX(o_totalprice) AS max
    FROM orders GROUP BY o_custkey
    """,
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-customer rollup is built
    as BASE states (orders before 1997-07-01) merged with a DELTA
    batch (the rest) — never a recompute over raw history — and the
    gate proves the merged result bit-identical to DuckDB's full
    GROUP BY over everything, which is the defining IVM invariant.
    All states are commutative monoids, sums decimal-exact, avg one
    IEEE division at finalization (`operators/ivm.py`)."""
    from tms_etl_spark.operators.ivm import (
        aggregate_states,
        finalize,
        merge_states,
    )

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-07-01 00:00:00").cast("timestamp")
    base = aggregate_states(
        o.where(F.col("o_orderdate") < cut), ["o_custkey"], "o_totalprice"
    )
    delta = aggregate_states(
        o.where(F.col("o_orderdate") >= cut), ["o_custkey"], "o_totalprice"
    )
    return finalize(merge_states(base, delta, ["o_custkey"]), ["o_custkey"])


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (adapted: the synthetic lineitem has no
    commitdate, so "late" = shipped after the order date): priority
    counts of orders with at least one late lineitem. The EXISTS is a
    LEFT SEMI join — the fact table never duplicates orders rows, and
    the non-equi part of the condition rides the semi join. One
    shuffle on the orderkey; the priority aggregation partial-combines
    on a 5-value key."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    WITH s AS (
        SELECT {sql_dsum8("CASE WHEN p.p_type LIKE 'PROMO%' THEN "
                          "l.l_extendedprice * (1 - l.l_discount) "
                          "ELSE 0 END", "promo_revenue")},
               {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)",
                          "total_revenue")}
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT promo_revenue, total_revenue,
           promo_revenue / total_revenue * 100 AS promo_pct
    FROM s
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promotion revenue share over a shipdate
    window. The part dim broadcasts; the conditional and total sums
    ride ONE aggregation over the joined fact (no second pass); the
    percentage is a single double divide+multiply of two exact
    decimal sums — deterministic cross-engine."""
    from tms_etl_spark.catalog.exact import dsum8

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum8(promo, "promo_revenue"),
            dsum8(rev, "total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue") * 100).alias(
            "promo_pct"
        ),
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10 AND p.p_brand <> 'Brand#45'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%7')
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (adapted: no partsupp table, so supplier
    participation comes from lineitem): distinct suppliers per
    (brand, type, size) excluding a complained-about supplier set.
    The part dim and the exclusion list both broadcast (the NOT IN is
    a broadcast ANTI join — never a shuffled subquery); the only fact
    shuffle is the final distinct-count aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_brand") != "Brand#45")
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape (adapted to available columns): revenue under
    an OR-of-ANDs predicate that mixes part and lineitem attributes.
    The disjunction cannot fully push to either scan, but its
    single-table residuals can (Catalyst extracts `p_brand IN (...)`
    to the part side and quantity bounds to the fact side); the dim
    broadcasts and the whole filter evaluates join-side in codegen —
    the canonical "complex predicate, still one fact pass" shape."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    from tms_etl_spark.catalog.exact import dsum8

    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(cond).agg(
        dsum8(rev, "revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH a AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(c_acctbal) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS total_acctbal
    FROM customer c, a
    WHERE c.c_acctbal > a.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (adapted: nationkey instead of phone country
    code, and "dormant" = no order since 2000 — every synthetic
    customer has SOME order, so the literal never-ordered form is
    vacuous): well-funded customers gone quiet. Composes a scalar
    subquery (the positive-balance average — broadcast as a 1-row
    cross join, exact-sum so the threshold is bit-identical
    cross-engine), an ANTI join against the date-filtered orders on
    the customer key (the filter pushes to the orders scan before the
    anti join shuffles), and an exact-sum aggregation by nation."""
    from tms_etl_spark.catalog.exact import davg, dsum

    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", "avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        dsum("c_acctbal", "total_acctbal"),
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH old_s AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), new_s AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 900000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 31 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'update'
           END AS change_type
    FROM old_s o FULL OUTER JOIN new_s n USING (o_orderkey)
    WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice)
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two snapshots (operators.merge.snapshot_diff): the
    "new" version is derived deterministically from orders (every
    97th key deleted, every 13th updated, every 31st re-inserted
    under a shifted key), then diffed — one full-outer join on the
    key, NULL-safe column comparison, unchanged keys dropped before
    materialization. The incremental-consumer primitive the upsert
    family writes for."""
    from tms_etl_spark.operators.merge import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    changed = F.col("o_orderkey") % 13 == 0
    new = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(changed, F.lit("X")).otherwise(F.col("o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.when(changed, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 31 == 0).select(
                (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(
        o, new, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )


@query(
    "ivm_join_delta",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance
    (operators.ivm.join_view_delta): orders and customer are each
    split into a history and an insert batch; the maintained view
    ``J_old ∪ ΔJ`` (delta rule ΔJ = ΔR⋈S_old ∪ R_new⋈ΔS) is then
    aggregated per nation and must equal the oracle's from-scratch
    full join — proving the delta algebra covers every new pair
    exactly once. Both delta joins carry the SMALL side as the
    delta, so a production batch compiles to broadcast probes of
    the history, never a history×history re-join."""
    from tms_etl_spark.operators.ivm import join_view_delta

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice",
        "o_orderdate",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cutoff = F.lit("1997-01-01").cast("date")
    r_old = o.where(F.col("o_orderdate") < cutoff).drop("o_orderdate")
    r_delta = o.where(F.col("o_orderdate") >= cutoff).drop("o_orderdate")
    s_old = c.where(F.col("c_custkey") % 20 != 0)
    s_delta = c.where(F.col("c_custkey") % 20 == 0)
    j_old = r_old.join(s_old, ["c_custkey"])
    dj = join_view_delta(r_old, s_old, r_delta, s_delta, ["c_custkey"])
    view = j_old.unionByName(dj)
    return view.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "ivm_retract_delta",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg
    FROM orders WHERE o_orderkey % 7 <> 0
    GROUP BY o_custkey
    """,
)
def ivm_retract_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE side of view maintenance
    (operators.ivm.retract_states): the per-customer rollup over ALL
    orders absorbs a retraction batch (every 7th orderkey) as
    negated states, and must equal the oracle's from-scratch rollup
    over the surviving rows — including dropping customers whose
    count hits zero. Cost is O(base keys + delete keys), the raw
    history is never rescanned; decimal-exact sums make the
    retraction bit-lossless (a double sum would accumulate cancel
    error)."""
    from tms_etl_spark.operators.ivm import aggregate_states, retract_states

    o = load_table(spark, sf_dir, "orders")
    base = aggregate_states(o, ["o_custkey"], "o_totalprice")
    deleted = aggregate_states(
        o.where(F.col("o_orderkey") % 7 == 0), ["o_custkey"], "o_totalprice"
    )
    return retract_states(base, deleted, ["o_custkey"])
