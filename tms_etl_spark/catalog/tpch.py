"""TPC-H shapes Q7/Q8/Q9/Q13/Q15/Q17/Q21 — the remaining canonical
analytic plan shapes the round-4 widening (Q4/Q14/Q16/Q19/Q22) did not
cover, adapted to the synthetic star schema (no partsupp table, no
commit/receipt dates — each adaptation is documented per query).

These matter less as "TPC-H parity" and more as plan-shape coverage:
nation-pair volume (Q7: two independent dim chains off one fact),
market share (Q8: conditional share of a grouped sum), profit rollup
(Q9: multi-dim star with a derived measure), distribution-of-counts
(Q13: outer join + double aggregation), argmax-by-group via scalar
subquery (Q15), correlated per-key average threshold (Q17), and
multi-witness EXISTS/NOT-EXISTS (Q21) — each is a pattern a warehouse
consumer of the reference's fact table would run at 100 TB
(reference analog: the month/loom summary screens,
/root/reference/src/main_01.py:443-452, generalized to ad-hoc BI).

Exactness follows ``catalog.exact``: every double aggregate goes
through DECIMAL so partial-aggregation order never shows up in the
last ulp, and every ratio divides two already-exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import davg, dsum, dsum8, sql_dsum8
from tms_etl_spark.sources.tables import load_table


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS INTEGER) AS ship_year,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region cr  ON cr.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN region sr  ON sr.r_regionkey = sn.n_regionkey
    WHERE sr.r_name = 'AMERICA' AND cr.r_name = 'EUROPE'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, ship_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape (adapted: region-pair instead of a fixed nation
    pair — the synthetic supplier table is tiny, so single nations go
    vacuous at sf0.001): shipping volume between two trade blocs by
    nation pair and year. Two independent dimension chains hang off
    the one fact table — supplier→nation→region keyed off the
    lineitem, customer→nation→region keyed off the order — and every
    dim broadcasts, so the only shuffles are the lineitem↔orders join
    and the final small-key aggregation. The shipdate window pushes to
    the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "AMERICA")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum8(rev, "revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) AS order_year,
               sn.n_name AS supp_nation,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN region cr  ON cr.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE cr.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ), shares AS (
        SELECT order_year,
               {sql_dsum8("CASE WHEN supp_nation = 'NATION_3' "
                          "THEN volume ELSE 0 END", "nation_volume")},
               {sql_dsum8("volume", "total_volume")}
        FROM all_sales GROUP BY order_year
    )
    SELECT order_year, nation_volume, total_volume,
           nation_volume / total_volume AS mkt_share
    FROM shares
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of a product segment inside
    one customer region, by order year. The share is a conditional
    sum over the same grouped pass as the total (never two scans),
    and the division is one double op over two exact decimal sums —
    bit-stable regardless of partitioning. All dims broadcast; the
    fact shuffles once into orders and once into the year
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    cust_asia = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_3", vol
    ).otherwise(F.lit(0.0))
    shares = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            dsum8(nation_vol, "nation_volume"),
            dsum8(vol, "total_volume"),
        )
    )
    return shares.select(
        "order_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) AS order_year,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount) "
                      "- 0.1 * p.p_retailprice * l.l_quantity", "profit")}
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, order_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (adapted: no partsupp, so supply cost is the
    deterministic proxy ``0.1 * p_retailprice`` per unit): profit on
    a product line by supplier nation and year. The derived measure
    subtracts two double products evaluated in the same association
    order on both engines (left-to-right), then sums through
    scale-8 decimal — exact despite the mixed arithmetic. The p_name
    LIKE filter prunes the broadcast part dim before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")

    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("order_year"))
        .agg(dsum8(profit, "profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of per-customer order counts,
    with a join-side (not WHERE-side) filter so customers whose only
    orders are urgent still count as zero. The outer join keeps every
    customer; COUNT(o_orderkey) — not COUNT(*) — makes the null-
    extended rows count 0. First aggregation shuffles on custkey,
    second on the tiny c_count domain (partial-combines to almost
    nothing map-side)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l.l_suppkey AS supplier_no,
               {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)",
                          "total_revenue")}
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: argmax over a derived aggregate (the "view"
    form). The quarterly revenue aggregate is computed ONCE and
    reused for both the max (a 1-row broadcast) and the equality
    filter — matching the original's CREATE VIEW discipline; ties
    return every maximal supplier, which is the well-defined set
    semantics (each total_revenue is an exact decimal sum, so the
    equality is bit-safe cross-engine)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum8(rev, "total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH brand_parts AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'
    ), part_avg AS (
        SELECT l.l_partkey,
               0.5 * (CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
                           AS DOUBLE) / COUNT(l.l_quantity)) AS qty_cut
        FROM lineitem l
        JOIN brand_parts b ON b.p_partkey = l.l_partkey
        GROUP BY l.l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: lineitems whose quantity is below half the
    per-part average — the correlated-scalar-per-key pattern. The
    per-part average is computed once as a grouped aggregate over the
    brand-restricted fact (semi-joined via the broadcast part list)
    and broadcast back against the fact — never a per-row subquery.
    The average is exact-sum/count (order-independent), so the
    threshold comparison is deterministic; 0.5×avg of integer-valued
    quantities never lands ON a representable boundary shared with a
    quantity, keeping `<` unambiguous cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    brand_li = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    )
    part_avg = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.5) * davg("l_quantity", "qty_avg")).alias("qty_cut")
    )
    small = brand_li.drop("p_partkey").join(
        F.broadcast(part_avg.withColumnRenamed("l_partkey", "pk")),
        F.col("l_partkey") == F.col("pk"),
    ).where(F.col("l_quantity") < F.col("qty_cut"))
    return small.agg(
        (dsum("l_extendedprice", "s") / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").cast("long").alias("n_small"),
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (adapted: "late" = shipped >90 days after the
    order date — the synthetic lineitem has no commit/receipt dates):
    suppliers who were the SOLE late supplier on a multi-supplier
    finished order. The oracle states it as the classic
    EXISTS / NOT EXISTS pair; the Spark plan deliberately uses a
    different, shuffle-minimal formulation — ONE groupBy(orderkey)
    computes each order's distinct-supplier count and distinct-LATE-
    supplier count, and the witness conditions become scalar
    predicates (n_supp > 1 AND n_late_supp = 1) semi-joined back to
    the late rows. Two passes over the fact (stats + late rows)
    instead of the naive THREE witness self-joins, and the per-order
    state is two counters, not a row set; the agreement of two
    independent formulations is exactly what the oracle gate is
    for."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    per_order = lo.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(is_late, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late_orders = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("o_orderkey")
    late_rows = lo.where(is_late).join(
        sole_late_orders.withColumnRenamed("o_orderkey", "ok"),
        F.col("o_orderkey") == F.col("ok"),
        "left_semi",
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        late_rows.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ), offers AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN eu_supp s ON s.s_suppkey = l.l_suppkey
        GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost, l_suppkey) AS rn
        FROM offers
    )
    SELECT p.p_partkey, p.p_type, p.p_size,
           s.s_name, s.s_acctbal, es.n_name AS nation,
           b.unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN eu_supp es ON es.s_suppkey = b.l_suppkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.rn = 1 AND p.p_size <= 15 AND p.p_type = 'LARGE'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (adapted: no partsupp, so the per-(part,
    supplier) offer price is the cheapest observed unit sale price):
    for every small LARGE-type part, the EUROPE supplier offering it
    cheapest. The correlated MIN becomes a grouped aggregate + window
    argmin (rank-1 with supplier tie-break, so the answer SET is
    well-defined); region/nation/supplier dims broadcast; the only
    fact shuffles are the (part,supplier) aggregation and the
    partkey argmin window. unit_cost is one double divide of source
    doubles — identical IEEE ops both engines."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    offers = (
        li.join(
            F.broadcast(eu_supp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .select(
            "p_partkey", "p_type", "p_size",
            "s_name", "s_acctbal", "nation", "unit_cost",
        )
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH nation_stock AS (
        SELECT l.l_partkey,
               {sql_dsum8("l.l_extendedprice * l.l_quantity", "part_value")}
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    ), total AS (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,8))) AS DOUBLE)
                 AS total_value,
               COUNT(*) AS n_parts
        FROM nation_stock
    )
    SELECT ns.l_partkey AS partkey, ns.part_value
    FROM nation_stock ns, total t
    WHERE ns.part_value > 1.2 * (t.total_value / t.n_parts)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (adapted: "stock value" = traded value
    l_extendedprice·l_quantity from one nation's suppliers): parts
    whose value exceeds 1.2× the nation's average part value — the
    scale-invariant form of Q11's FRACTION·total cut (the original's
    0.0001/SF constant is itself scale-adjusted; an average-relative
    threshold stays non-vacuous at every SF). The global threshold is
    a second aggregation OVER THE FIRST's result (never a second fact
    scan) broadcast as a 1-row cross join. Both engines compare
    against the same exact-decimal-derived double, so the > cut is
    bit-deterministic. Note l_extendedprice·
    l_quantity carries ≤2+0 decimals — scale-8 coercion is
    midpoint-free; the re-sum of part_value doubles goes back
    through DECIMAL(28,8) (each part_value is a ≤4-decimal value
    exactly representable in double, so the cast is exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    stock_val = F.col("l_extendedprice") * F.col("l_quantity")
    nation_stock = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum8(stock_val, "part_value"))
    )
    total = nation_stock.agg(
        F.sum(F.col("part_value").cast("decimal(28,8)"))
        .cast("double")
        .alias("total_value"),
        F.count("*").alias("n_parts"),
    )
    return (
        nation_stock.crossJoin(F.broadcast(total))
        .where(
            F.col("part_value")
            > F.lit(1.2) * (F.col("total_value") / F.col("n_parts"))
        )
        .select("partkey", "part_value")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_class
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (adapted: no shipmode column, so lines class
    into SLOW/FAST by shipping delay >60 days): urgent-vs-other order
    counts per shipping class. The canonical conditional-tally-
    after-join shape: one fact join, one 2-key aggregation, both
    CASE tallies in the same pass."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    ship_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "SLOW",
    ).otherwise("FAST")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ), heavy AS (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN red_parts rp ON rp.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 100
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (SELECT 1 FROM heavy h WHERE h.l_suppkey = s.s_suppkey)
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (adapted: no partsupp availability, so the
    inner threshold is shipped volume): suppliers who moved >100
    units of 'red' parts since 1996 — the nested-semi-join chain.
    Part list broadcasts into the fact, the HAVING aggregate shrinks
    the fact to supplier keys, and that tiny key set drives a
    broadcast SEMI join against supplier. Integer-valued quantities
    sum exactly as doubles (well under 2^53), so the >100 cut is
    engine-stable."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
    )
