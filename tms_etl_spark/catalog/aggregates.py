"""Aggregation operators (SURVEY.md §2.4) against the DuckDB oracle.

Shuffle posture: every groupBy here benefits from partial (map-side)
aggregation — Spark emits a partial hash-agg before the exchange, so
the shuffle volume is O(groups), not O(rows). Grouping-set queries
expand rows once map-side (Expand) then aggregate; that is the right
trade at 100 TB versus re-scanning per grouping level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import davg, dec, dsum, sql_davg, sql_dsum
from tms_etl_spark.sources.tables import load_table


@query(
    "agg_sum_avg_min_max",
    oracle=f"""
    SELECT l_suppkey,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_sum_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: multi-metric grouped summary (reference: per-month×kind
    file summary, /root/reference/src/main_02.py:823-900)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        # parquet ms-timestamps read as NTZ; cast to session-TZ
        # timestamp (UTC-pinned) for dtype parity with the oracle
        F.min("l_shipdate").cast("timestamp").alias("first_ship"),
        F.max("l_shipdate").cast("timestamp").alias("last_ship"),
        F.count("*").alias("n"),
    )


@query(
    "agg_conditional_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_error,
           COUNT(*) AS n_total
    FROM events GROUP BY user_id
    """,
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: success/error tallies (reference: per-file ok/err counters,
    /root/reference/src/main_01.py:366-437)."""
    ev = load_table(spark, sf_dir, "events")
    one_if = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
    return ev.groupBy("user_id").agg(
        one_if("purchase").alias("n_purchase"),
        one_if("error").alias("n_error"),
        F.count("*").alias("n_total"),
    )


@query(
    "agg_filtered_count",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_urgent
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_custkey
    """,
)
def agg_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: filtered count by key (reference: existence-probe COUNT(*),
    /root/reference/src/main_01.py:242-246)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_urgent"))
    )


@query(
    "agg_success_ratio",
    oracle="""
    SELECT user_id,
           (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            / COUNT(*)) * 100 AS purchase_pct
    FROM events GROUP BY user_id
    """,
)
def agg_success_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: rate aggregate (reference: collection success-rate,
    /root/reference/src/tms_colector.py:299)."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    return ev.groupBy("user_id").agg(
        ((ok / F.count("*")) * 100).alias("purchase_pct")
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: rollup subtotals (reference's implicit month→kind summary
    hierarchy, /root/reference/src/main_02.py:830-881)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: cube — all grouping combinations in one Expand pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_extendedprice", "sum_price")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: explicit grouping sets via the SQL surface."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (exact form): continuous percentiles. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` both linearly interpolate over the
    sorted values, so results match exactly. The approximate sibling
    (``approx_percentile``) is `agg_approx_distinct`'s rows-only
    cousin — sketch outputs are engine-specific by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)  AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_5pct,
           TRUE AS orders_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: approx_count_distinct (HyperLogLog++). The raw estimate is
    deterministic per engine but not across engines, so the sketch
    value itself can't be hash-compared; instead the query emits the
    exact counts plus in-query accuracy assertions (|approx-exact| /
    exact ≤ 5%; measured ≤0.9% at rsd=0.01 on sf0.001–0.01), which the
    oracle pins to TRUE. At 100 TB the approx form replaces an exact
    COUNT(DISTINCT) whose shuffle is O(distinct values)."""
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx: Column, exact: Column) -> Column:
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= F.lit(0.05)
        )

    agged = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("__a_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("__a_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return agged.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        within(F.col("__a_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("__a_orders"), F.col("exact_orders")).alias("orders_within_5pct"),
    )


@query(
    "agg_exact_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_exact_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A8: exact distinct counts (expands to a two-phase aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_variance_exact",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                          * CAST(o_totalprice AS DECIMAL(19,4))), 0) AS DOUBLE)
             AS ssq,
           COUNT(*) AS n,
           (CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                           * CAST(o_totalprice AS DECIMAL(19,4))), 0) AS DOUBLE)
            - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
              * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
              / COUNT(*))
           / (COUNT(*) - 1) AS var_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent sample variance via exact decimal sums —
    ``var_samp``'s streaming accumulation is partition-order-dependent;
    this form is reproducible on any cluster layout.

    The square is a *decimal* multiply on both sides (exact): a
    double square decimal-cast afterwards is NOT cross-engine-safe at
    16 significant digits — DuckDB's double→decimal cast scales by
    10^s in double arithmetic, whose ulp reaches 0.5 there. DuckDB
    gets DECIMAL(19,4) operands to force int128 multiply (width-18
    would overflow); Spark's (18,4)×(18,4)→(37,8) is already exact.
    The group sum needs 22 significant digits, past double's 15-16 —
    the final decimal→double cast would differ by an ulp between
    engines — so ssq is rounded to integer in decimal space first
    (exact both sides; integers < 2^53 convert identically)."""
    o = load_table(spark, sf_dir, "orders")
    p = dec("o_totalprice")
    s = F.sum(p).cast("double")
    ssq = F.round(F.sum(p * p), 0).cast("double")
    n = F.count("*")
    return o.groupBy("o_orderpriority").agg(
        s.alias("s"),
        ssq.alias("ssq"),
        n.alias("n"),
        ((ssq - s * s / n) / (n - F.lit(1))).alias("var_price"),
    )


@query(
    "streaming_counts_batch",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def streaming_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/T7 batch-equivalent: running status counts (reference:
    per-status tallies during collection,
    /root/reference/src/tms_colector.py:192-250). The streaming form
    (update-mode groupBy) is exercised in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "agg_string_concat",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
             AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/F8: ordered string aggregation — collect_set is unordered,
    so the deterministic form is sort-then-join (listagg/string_agg
    with ORDER BY on the oracle side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        )
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT o_custkey,
           bool_and(o_totalprice > 50000) AS all_big,
           bool_or(o_orderstatus = 'F') AS any_final,
           COUNT(*) AS n
    FROM orders GROUP BY o_custkey
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 boolean forms: every/any aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.bool_and(F.col("o_totalprice") > 50000).alias("all_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.count("*").alias("n"),
    )


@query(
    "quality_profile",
    oracle="""
    SELECT 'n_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
    FROM lineitem
    UNION ALL
    SELECT 'null_frac:l_shipdate',
           CAST(COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'dup_rows:l_orderkey+l_linenumber',
           CAST(COUNT(*) AS DOUBLE)
             - CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'oob:l_quantity',
           CAST(COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 END)
                AS DOUBLE)
    FROM lineitem
    """,
)
def quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality suite (operators.expectations.profile):
    row count, null fraction, key-uniqueness violation count, range
    violations — every check a conditional aggregate in ONE scan +
    ONE 1-row aggregate (the naive one-query-per-check form scans the
    table once per metric). Values chosen non-vacuous on this data:
    (l_orderkey, l_linenumber) has ~14k duplicate rows and quantities
    run 1–50 against a [1, 45] bound."""
    from tms_etl_spark.operators.expectations import profile

    li = load_table(spark, sf_dir, "lineitem")
    return profile(
        li,
        null_cols=["l_shipdate"],
        unique_keys=[["l_orderkey", "l_linenumber"]],
        bounds={"l_quantity": (1, 45)},
    )


@query(
    "profile_histogram",
    oracle=f"""
    SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
           floor(l_extendedprice / 5000.0) * 5000.0 AS bucket_lo,
           COUNT(*) AS n,
           {sql_dsum("l_extendedprice", "total")}
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram over a measure column — the numeric
    profiling primitive behind data-quality dashboards and skew
    diagnosis. The bucket id is floor(x / width): one IEEE division +
    floor (bit-identical cross-engine), then a single map-side-combined
    aggregation — a histogram of a 100 TB column moves #buckets rows
    through the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0)
    return li.groupBy(
        bucket.cast("long").alias("bucket"),
        (bucket * 5000.0).alias("bucket_lo"),
    ).agg(F.count("*").alias("n"), dsum("l_extendedprice", "total"))


@query(
    "agg_mode_per_key",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT user_id, event_type, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY cnt DESC, event_type NULLS LAST
               ) AS rn
        FROM c
    )
    SELECT user_id, event_type AS modal_type, CAST(cnt AS BIGINT) AS cnt
    FROM r WHERE rn = 1
    """,
)
def agg_mode_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key mode (most frequent event type per
    user, ties broken lexicographically) — built as count + rank
    rather than Spark's `mode()` aggregate, whose tie behavior is
    engine-internal; the explicit (cnt DESC, value ASC) order makes
    the answer well-defined on any engine and any partitioning. The
    count partial-aggregates map-side onto the (user, type) grain;
    the rank window runs on that already-reduced grain, reusing its
    user-key partitioning."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    # asc_nulls_last, not asc: Spark sorts NULLS FIRST by default
    # while DuckDB's plain ASC is NULLS LAST — a NULL modal value
    # tied with a real one would flip between engines otherwise
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.asc_nulls_last("event_type")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


from tms_etl_spark.operators.quantiles import (  # noqa: E402
    sql_histogram_thresholds as _sql_hist,
)


@query(
    "agg_median_bucketed",
    oracle=f"""
    WITH base AS (
        SELECT CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(19,4)) * 100)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    t AS ({_sql_hist('base', 'cents', 2)})
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_rows,
           t.t1 AS median_cents
    FROM t
    """,
)
def agg_median_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus median WITHOUT a global sort or a per-partition
    value buffer: the lower median is the smallest value whose
    cumulative count reaches n/2 (integer logic 2·cum ≥ n), read off
    the shared bucketed value-grain histogram
    (`operators/quantiles.py`). Contrast with `percentile()`: exact
    but buffers every value per partition; and `percentile_approx`:
    bounded-memory but approximate. This is exact AND
    histogram-bounded — the right shape when the value grain (price
    cents) is much smaller than the row count."""
    from tms_etl_spark.operators.quantiles import (
        histogram_quantile_thresholds,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.floor(F.col("l_extendedprice").cast("decimal(19,4)") * 100)
        .cast("long")
        .alias("cents")
    )
    th = histogram_quantile_thresholds(base, "cents", 2, prefix="t")
    n = base.agg(F.count("*").cast("long").alias("n_rows"))
    return n.crossJoin(F.broadcast(th)).select(
        "n_rows", F.col("t1").alias("median_cents")
    )


@query(
    "agg_median_per_group",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(19,4)) * 100)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    h AS (
        SELECT l_returnflag, cents, COUNT(*) AS cnt
        FROM base GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, cents,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM h
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN cum * 2 >= n THEN cents END)
              + MIN(CASE WHEN cum * 2 >= n + 2 - (n % 2) THEN cents END)
                AS DOUBLE) / 2 AS median_cents
    FROM c GROUP BY l_returnflag
    """,
)
def agg_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group medians (price cents by return flag) from
    group-local bucketed histograms — the grouped generalization of
    `agg_median_bucketed`. `percentile()` would buffer every group
    member in one aggregation buffer (corpus-sized groups → OOM);
    here per-task state is bounded by the (group, bucket) partition
    and every side table is output-sized."""
    from tms_etl_spark.operators.quantiles import (
        histogram_median_per_group,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice").cast("decimal(19,4)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return histogram_median_per_group(base, "l_returnflag", "cents").select(
        "l_returnflag", F.col("median").alias("median_cents")
    )


@query(
    "agg_percentiles_per_group",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(19,4)) * 100)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    h AS (
        SELECT l_returnflag, cents, COUNT(*) AS cnt
        FROM base GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, cents,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM h
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cum * 2 >= 1 * n THEN cents END) AS p50_cents,
           MIN(CASE WHEN cum * 10 >= 9 * n THEN cents END) AS p90_cents,
           MIN(CASE WHEN cum * 100 >= 99 * n THEN cents END) AS p99_cents
    FROM c GROUP BY l_returnflag
    """,
)
def agg_percentiles_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank p50/p90/p99 per group (price cents by return
    flag) — the latency-dashboard shape, computed from group-local
    bucketed histograms with pure integer rank logic (``cum·den ≥
    num·n``): exact, interpolation-free, engine-identical, and no
    per-group value buffering."""
    from tms_etl_spark.operators.quantiles import (
        histogram_fraction_values_per_group,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice").cast("decimal(19,4)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return histogram_fraction_values_per_group(
        base,
        "l_returnflag",
        "cents",
        fractions=[(1, 2), (9, 10), (99, 100)],
        names=["p50_cents", "p90_cents", "p99_cents"],
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        FROM lineitem GROUP BY 1
    ), m AS (
        SELECT l_returnflag, n,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n AS r2,
               CAST(s3 AS DOUBLE) / n AS r3,
               CAST(s4 AS DOUBLE) / n AS r4
        FROM s
    ), c AS (
        SELECT l_returnflag, n, m1,
               r2 - m1 * m1 AS m2,
               r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS m3,
               r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
                  - 3 * m1 * m1 * m1 * m1 AS m4
        FROM m
    )
    SELECT l_returnflag, n, m1 AS mean,
           m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0 AS excess_kurtosis
    FROM c
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group population skewness and excess kurtosis of the
    quantity distribution — the 3rd/4th-moment companions of
    `agg_variance_exact`, the tails/asymmetry profile a feature-
    drift monitor tracks. NOT Spark's builtin `skewness`/`kurtosis`
    (float-accumulating, order-dependent): raw power sums are EXACT
    BIGINTs (quantity is integer-valued; sum of x^4 stays < 2^63
    through sf100), central moments come from the power sums in IEEE
    double with identical parse trees on both engines, so the result
    is bit-identical and partition-layout-independent. One map-side-
    combined exchange on the group key; everything after is
    groups-sized arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q * q * q).cast("long").alias("s3"),
        F.sum(q * q * q * q).cast("long").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m = s.select(
        "l_returnflag",
        "n",
        m1.alias("m1"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    m1c, r2c, r3c, r4c = (F.col(x) for x in ("m1", "r2", "r3", "r4"))
    c = m.select(
        "l_returnflag",
        "n",
        "m1",
        (r2c - m1c * m1c).alias("m2"),
        (r3c - F.lit(3) * m1c * r2c + F.lit(2) * m1c * m1c * m1c).alias(
            "m3"
        ),
        (
            r4c
            - F.lit(4) * m1c * r3c
            + F.lit(6) * m1c * m1c * r2c
            - F.lit(3) * m1c * m1c * m1c * m1c
        ).alias("m4"),
    )
    m2, m3_, m4_ = F.col("m2"), F.col("m3"), F.col("m4")
    return c.select(
        "l_returnflag",
        "n",
        F.col("m1").alias("mean"),
        (m3_ / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2))).alias("skewness"),
        (m4_ / (m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(19,4)) * 100)
                    AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    h AS (
        SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS wsum
        FROM base GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, cents,
               SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(wsum) OVER (PARTITION BY l_returnflag) AS tw
        FROM h
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN cumw * 2 >= tw THEN cents END) AS BIGINT)
             AS wmedian_cents,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM c GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price cents weighted by quantity, per return
    flag) — the order statistic behind quantity-weighted price
    benchmarks. Same group-local bucketed-histogram discipline as
    `agg_median_per_group`, with COUNTS replaced by integer WEIGHT
    SUMS: one partial-combining exchange to the (group, value)
    grain, cumulative weights over the group-local value histogram,
    and the nearest-rank pick is the integer condition
    2·cumw >= total_w — no per-group value buffer, no floats, so the
    result is engine-exact. Weights stay BIGINT (quantity is
    integral); a fractional-weight variant would ride DECIMAL the
    same way."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice").cast("decimal(19,4)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    h = base.groupBy("l_returnflag", "cents").agg(
        F.sum("w").cast("long").alias("wsum")
    )
    wspec = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.select(
        "l_returnflag",
        "cents",
        F.sum("wsum").over(wspec).alias("cumw"),
        F.sum("wsum").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cumw") * 2 >= F.col("tw"), F.col("cents"))
        )
        .cast("long")
        .alias("wmedian_cents"),
        F.max("tw").cast("long").alias("total_weight"),
    )
