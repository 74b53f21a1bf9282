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

from pyspark.sql import DataFrame, SparkSession
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
