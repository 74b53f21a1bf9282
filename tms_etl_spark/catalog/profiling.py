"""Dataset profiling: categorical-concentration audits (Gini
impurity per column) and per-slice dataset cards (docs / chars /
tokens / corpus share per (lang, source)).

The shapes a training-data curation pipeline runs before and after
every filtering stage — each a full-scan reduction onto a bounded
key set (column names; (lang, source) slices), so the output is
metadata-sized at any corpus scale and the arithmetic is exact:
integer counts and sums, one final IEEE division per ratio.
Reference analog: the reference's per-month/per-loom summary grids
(/root/reference/src/main_01.py:443-452) recast as corpus metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

# (table, column) pairs audited by the concentration profile. Kept
# to dimension-cardinality columns so per-value counts stay bounded.
_GINI_COLS = (
    ("events", "event_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("documents", "lang"),
    ("documents", "source"),
)


def _gini_sql_one(table: str, col: str) -> str:
    return f"""
    SELECT '{table}.{col}' AS column_name,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
             / CAST(SUM(c) * SUM(c) AS DOUBLE) AS gini_impurity
    FROM (SELECT {col} AS v, COUNT(*) AS c FROM {table} GROUP BY 1)
    """


@query(
    "profile_categorical_gini",
    oracle=" UNION ALL ".join(
        _gini_sql_one(t, c) for t, c in _GINI_COLS
    ),
)
def profile_categorical_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity (1 - sum p_i^2) per categorical column — the
    concentration audit that flags near-constant columns (impurity
    ~0) and high-entropy id-like columns before training-data
    export. Computed from INTEGER value counts only: impurity =
    (n^2 - sum c_i^2) / n^2, one exact integer expression and one
    final IEEE division, so no log/float accumulation to drift
    cross-engine (unlike Shannon entropy). Each column is a
    partial-aggregated value-count reduction; the per-column fold is
    over n_distinct rows — metadata-sized. The per-column scans stay
    independent (no multi-way join), and each reduces map-side
    before its single exchange."""
    out: DataFrame | None = None
    for table, col in _GINI_COLS:
        df = load_table(spark, sf_dir, table)
        counts = df.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("c")
        )
        n = F.sum("c")
        sumsq = F.sum(F.col("c") * F.col("c"))
        one = counts.agg(
            F.lit(f"{table}.{col}").alias("column_name"),
            n.cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_distinct"),
            ((n * n - sumsq).cast("double") / (n * n).cast("double")).alias(
                "gini_impurity"
            ),
        )
        out = one if out is None else out.unionAll(one)
    assert out is not None
    return out


@query(
    "dataset_card_stats",
    oracle=r"""
    WITH per AS (
        SELECT lang, source,
               COUNT(*) AS docs,
               SUM(n_chars) AS chars,
               SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source,
           CAST(docs AS BIGINT) AS docs,
           CAST(chars AS BIGINT) AS chars,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(docs AS DOUBLE) / CAST(SUM(docs) OVER () AS DOUBLE)
             AS doc_share,
           CAST(tokens AS DOUBLE) / CAST(SUM(tokens) OVER () AS DOUBLE)
             AS token_share
    FROM per
    """,
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: per-(lang, source) document / character /
    whitespace-token counts plus each slice's share of the corpus —
    the summary grid that heads a training-data release note. Token
    counting reuses the text_token_count expression (JVM split, no
    UDF). One full scan partial-aggregates onto (lang x source) keys;
    the corpus-total shares ride an unpartitioned window over that
    bounded grid (|langs| x |sources| rows — metadata, NOT data), so
    the single-partition window is safe at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("long")).alias(
            "tokens"
        ),
    )
    w = Window.partitionBy()
    return per.select(
        "lang",
        "source",
        F.col("docs").cast("long").alias("docs"),
        F.col("chars").cast("long").alias("chars"),
        F.col("tokens").cast("long").alias("tokens"),
        (
            F.col("docs").cast("double")
            / F.sum("docs").over(w).cast("double")
        ).alias("doc_share"),
        (
            F.col("tokens").cast("double")
            / F.sum("tokens").over(w).cast("double")
        ).alias("token_share"),
    )


@query(
    "profile_partition_skew",
    oracle="""
    WITH p AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS part,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) * COUNT(*) AS DOUBLE) / SUM(n) AS skew_ratio
    FROM p
    """,
)
def profile_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key skew diagnostic: row counts per candidate
    partition (order month) reduced to min/max/total and the skew
    ratio max/mean — the number that predicts straggler tasks if this
    key becomes the table's partitioning at scale (ratio ≈ 1 is
    uniform; ≫ 1 means the hottest partition dominates wall-clock).
    One partial-aggregating shuffle onto the month grain, then a
    scalar reduction; the ratio is one IEEE division of exact
    integers (max·count and total ≤ 2^53)."""
    o = load_table(spark, sf_dir, "orders")
    p = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("part")
    ).agg(F.count("*").alias("n"))
    return p.agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.sum("n").cast("long").alias("total_rows"),
        (
            (F.max("n") * F.count("*")).cast("double") / F.sum("n")
        ).alias("skew_ratio"),
    )


@query(
    "profile_dup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE)
             / COUNT(*) AS dup_rate
    FROM documents GROUP BY source
    """,
)
def profile_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate scoreboard per source — the first number a
    corpus triage looks at (which feeds are boilerplate mills).
    COUNT(DISTINCT digest) expands to a two-level aggregation
    (partial on (source, digest), final on source) — both exchanges
    map-side combined; the digest keeps the distinct state at 32
    bytes/row instead of document-sized."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct(F.md5("text")).cast("long").alias("n_distinct"),
        (
            (F.count("*") - F.count_distinct(F.md5("text"))).cast("double")
            / F.count("*")
        ).alias("dup_rate"),
    )


@query(
    "profile_dup_cluster_sizes",
    oracle="""
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM (
        SELECT COUNT(*) AS sz FROM documents GROUP BY md5(text)
    ) GROUP BY sz
    """,
)
def profile_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution — the boilerplate
    fingerprint of a corpus (a fat tail here predicts hot keys for
    every content-keyed operator downstream). Two map-side-combined
    reductions: digest grain, then size grain."""
    d = load_table(spark, sf_dir, "documents")
    sizes = d.groupBy(F.md5("text")).agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters")
    )


@query(
    "profile_categorical_entropy",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ), t AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_values
        FROM c
    )
    SELECT 'orders.o_orderpriority' AS column_name,
           t.n_values,
           CAST(SUM(CAST(
               -(CAST(cnt AS DOUBLE) / t.n)
                 * (ln(CAST(cnt AS DOUBLE) / t.n) / ln(2.0))
               AS DECIMAL(28,14))) AS DOUBLE) AS entropy_bits,
           CAST(SUM(CAST(
               -(CAST(cnt AS DOUBLE) / t.n)
                 * (ln(CAST(cnt AS DOUBLE) / t.n) / ln(2.0))
               AS DECIMAL(28,14))) AS DOUBLE)
             / (ln(CAST(t.n_values AS DOUBLE)) / ln(2.0))
             AS normalized
    FROM c, t GROUP BY t.n, t.n_values
    """,
)
def profile_categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the order-priority distribution —
    the information-content companion of `profile_categorical_gini`
    (entropy weights rare categories harder than impurity). One
    partial-combining count to the value grain; p·log2(p) terms are
    identical-parse-tree IEEE (explicit ln(x)/ln(2)) over exact
    (count, n) pairs and the term sum rides DECIMAL(28,14) so the
    grid accumulation is order-independent. Normalized by log2 of
    the value-domain size (1.0 = uniform)."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_orderpriority").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    t = c.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_values"),
    )
    p = F.col("cnt").cast("double") / F.col("n")
    term = (-p * (F.log(p) / F.log(F.lit(2.0)))).cast("decimal(28,14)")
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("n", "n_values")
        .agg(F.sum(term).cast("double").alias("entropy_bits"))
        .select(
            F.lit("orders.o_orderpriority").alias("column_name"),
            "n_values",
            "entropy_bits",
            (
                F.col("entropy_bits")
                / (
                    F.log(F.col("n_values").cast("double"))
                    / F.log(F.lit(2.0))
                )
            ).alias("normalized"),
        )
    )
