"""Privacy audits over the customer dimension: k-anonymity and
l-diversity — the re-identification checks a training-data release
pipeline runs before publishing user-derived tables (Sweeney 2002,
k-anonymity; Machanavajjhala et al. 2007, l-diversity — public
literature).

Both are plain grouped aggregations: one partial-aggregating shuffle
on the quasi-identifier key, output bounded by QI-combination
cardinality. At 100 TB the QI grid is the small side (nations ×
segments), so these run as cheaply as any rollup; the point of having
them in the catalog is the release-gate semantics, not plan novelty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_K = 5
_L = 3


@query(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
           c_mktsegment AS qi_segment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) < {_K} AS violates_k{_K}
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: every quasi-identifier equivalence class
    (nation × market segment) with its size and whether it violates
    k=5 — rows in violating classes are re-identifiable to fewer than
    k candidates and must be suppressed or generalized before
    release. One grouped count; the QI grid is the output."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").cast("long").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
    ).agg(
        F.count("*").cast("long").alias("class_size"),
        (F.count("*") < _K).alias(f"violates_k{_K}"),
    )


@query(
    "privacy_l_diversity",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END
             AS qi_balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT c_mktsegment) < {_L} AS violates_l{_L}
    FROM customer
    GROUP BY 1, 2
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: k-anonymity alone fails when a class is
    homogeneous in the SENSITIVE attribute (everyone in the class
    shares it, so membership leaks the value). Per QI class (nation ×
    balance band), the number of distinct sensitive values (market
    segment) and whether it violates l=3. COUNT(DISTINCT) expands to
    a two-level aggregation — partial on (QI, segment), final on QI —
    both shuffles partial-aggregate map-side."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").cast("long").alias("qi_nation"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .otherwise("nonneg")
        .alias("qi_balance_band"),
    ).agg(
        F.count("*").cast("long").alias("class_size"),
        F.count_distinct(F.col("c_mktsegment"))
        .cast("long")
        .alias("l_distinct"),
        (F.count_distinct(F.col("c_mktsegment")) < _L).alias(
            f"violates_l{_L}"
        ),
    )


@query(
    "privacy_k_anonymize",
    oracle=f"""
    WITH sizes AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        FROM customer GROUP BY 1, 2
    )
    SELECT c.c_custkey,
           CAST(c.c_nationkey AS BIGINT) AS qi_nation,
           CASE WHEN s.n < {_K} THEN '*' ELSE c.c_mktsegment END
             AS qi_segment
    FROM customer c
    JOIN sizes s
      ON c.c_nationkey = s.c_nationkey
     AND c.c_mktsegment = s.c_mktsegment
    """,
)
def privacy_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforcement counterpart of `privacy_k_anonymity`: the RELEASED
    table after cell suppression — rows in QI classes smaller than
    k=5 have their segment generalized to '*' (suppressed cells merge
    into one per-nation class, the standard single-pass local
    suppression). Plan: the class-size table is QI-grid-sized →
    broadcast join back onto the rows, so anonymization is map-side
    after one partial-aggregating shuffle."""
    c = load_table(spark, sf_dir, "customer")
    sizes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("__n")
    )
    return (
        c.join(
            F.broadcast(sizes), ["c_nationkey", "c_mktsegment"]
        ).select(
            "c_custkey",
            F.col("c_nationkey").cast("long").alias("qi_nation"),
            F.when(F.col("__n") < _K, "*")
            .otherwise(F.col("c_mktsegment"))
            .alias("qi_segment"),
        )
    )


@query(
    "privacy_t_closeness",
    oracle="""
    WITH base AS (
        SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
               c_mktsegment AS qi_segment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ), vals AS (
        SELECT DISTINCT band FROM base
    ), nv AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vals
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
    ), gcum AS (
        SELECT v.band,
               CAST(SUM(CAST(COALESCE(g.cnt, 0) AS BIGINT))
                    OVER (ORDER BY v.band ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cum_g
        FROM vals v LEFT JOIN (
            SELECT band, COUNT(*) AS cnt FROM base GROUP BY 1
        ) g USING (band)
    ), classes AS (
        SELECT qi_nation, qi_segment,
               CAST(COUNT(*) AS BIGINT) AS n_c
        FROM base GROUP BY 1, 2
    ), cls AS (
        SELECT qi_nation, qi_segment, band,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY 1, 2, 3
    ), grid AS (
        SELECT c.qi_nation, c.qi_segment, c.n_c, v.band,
               CAST(SUM(CAST(COALESCE(x.cnt, 0) AS BIGINT)) OVER (
                   PARTITION BY c.qi_nation, c.qi_segment
                   ORDER BY v.band ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_c
        FROM classes c
        CROSS JOIN vals v
        LEFT JOIN cls x
          ON x.qi_nation = c.qi_nation
         AND x.qi_segment = c.qi_segment
         AND x.band = v.band
    )
    SELECT g.qi_nation, g.qi_segment, MAX(g.n_c) AS class_size,
           CAST(SUM(ABS(g.cum_c * t.n - gl.cum_g * g.n_c)) AS DOUBLE)
             / (CAST(MAX(g.n_c) AS DOUBLE) * t.n * (nv.v - 1))
             AS t_emd,
           CAST(SUM(ABS(g.cum_c * t.n - gl.cum_g * g.n_c)) AS DOUBLE)
             / (CAST(MAX(g.n_c) AS DOUBLE) * t.n * (nv.v - 1)) > 0.2
             AS violates_t02
    FROM grid g
    JOIN gcum gl USING (band), tot t, nv
    GROUP BY g.qi_nation, g.qi_segment, t.n, nv.v
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al.) — the third leg of the privacy
    trio: a QI class leaks when its SENSITIVE-ATTRIBUTE DISTRIBUTION
    (account-balance band, ordered) strays from the global one even
    if the class is large (k) and diverse (l). Distance is the exact
    1-D earth-mover's distance over the ordered band domain:
    EMD = sum_v |cumP - cumQ| / (V-1), computed INTEGER-EXACTLY as
    |cum_c*N - cum_g*n_c| summed over the (class x band) grid and
    divided once at the end — no per-class float accumulation, so
    both engines agree bitwise. Scale shape: two partial-combining
    aggregates over the corpus (class-band and global-band counts);
    everything after runs on the grid (QI classes x bands — an
    output-sized table), with cumulative windows partitioned by
    class, never corpus-wide."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_nationkey").cast("long").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    base = base.localCheckpoint(eager=False)
    vals = base.select("band").distinct()
    nv = vals.agg(F.count("*").cast("long").alias("v"))
    tot = base.agg(F.count("*").cast("long").alias("n"))
    gcnt = base.groupBy("band").agg(F.count("*").cast("long").alias("cnt"))
    wg = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # unpartitioned window over VALS: the band domain is bounded
    # metadata (dozens of rows), not corpus-sized
    glob = (
        vals.join(gcnt, "band", "left")
        .select("band", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .select("band", F.sum("cnt").over(wg).cast("long").alias("cum_g"))
    )
    classes = base.groupBy("qi_nation", "qi_segment").agg(
        F.count("*").cast("long").alias("n_c")
    )
    cls = base.groupBy("qi_nation", "qi_segment", "band").agg(
        F.count("*").cast("long").alias("cnt")
    )
    grid = (
        classes.crossJoin(vals)
        .join(cls, ["qi_nation", "qi_segment", "band"], "left")
        .select(
            "qi_nation",
            "qi_segment",
            "n_c",
            "band",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    wc = (
        Window.partitionBy("qi_nation", "qi_segment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = grid.select(
        "qi_nation",
        "qi_segment",
        "n_c",
        "band",
        F.sum("cnt").over(wc).cast("long").alias("cum_c"),
    )
    j = (
        grid.join(glob, "band")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nv))
    )
    t_emd = F.sum(
        F.abs(F.col("cum_c") * F.col("n") - F.col("cum_g") * F.col("n_c"))
    ).cast("double") / (
        F.max("n_c").cast("double")
        * F.max("n")
        * (F.max("v") - F.lit(1))
    )
    return j.groupBy("qi_nation", "qi_segment").agg(
        F.max("n_c").alias("class_size"),
        t_emd.alias("t_emd"),
        (t_emd > 0.2).alias("violates_t02"),
    )
