"""Large-join physical strategies (SURVEY.md §2.3 J5, §4): the same
logical join executed as sort-merge and shuffled-hash via hints, plus
a correlated-subquery shape. Semantically identical to their oracles;
the point is certifying the engine controls the physical plan (see
tests/test_plans.py for the explain() assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import dsum8, sql_dsum8
from tms_etl_spark.sources.tables import load_table

_REV_ORACLE = f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {sql_dsum8("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderpriority
"""


def _revenue_join(spark: SparkSession, sf_dir: str, hint: str | None) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    if hint:
        o = o.hint(hint)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum8(rev, "revenue"))
    )


@query("join_sort_merge", oracle=_REV_ORACLE)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 large-large: sort-merge join — both sides shuffle on the
    key, sorted streams merge. The default for fact-fact joins whose
    build side exceeds memory; skew handled by AQE skew-join."""
    return _revenue_join(spark, sf_dir, "merge")


@query("join_shuffle_hash", oracle=_REV_ORACLE)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 large-large: shuffled hash join — same exchange, hash build
    instead of sort. Wins when one side is much smaller per-partition
    (no sort cost); loses the ability to spill gracefully."""
    return _revenue_join(spark, sf_dir, "shuffle_hash")


@query(
    "scalar_subquery_share",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                                       AS DOUBLE) FROM orders) AS price_share
    FROM orders WHERE o_totalprice > 400000
    """,
)
def scalar_subquery_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: each row normalized by a global aggregate —
    planned as a broadcast of the 1-row subquery result, not a
    shuffle (the 100 TB-safe global-normalization shape)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                                           AS DOUBLE) FROM orders) AS price_share
        FROM orders WHERE o_totalprice > 400000
        """
    )


@query(
    "correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
    """,
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J6: correlated EXISTS — decorrelated by Catalyst into the
    same left-semi join the DataFrame API would write."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    s.createOrReplaceTempView("supplier")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(o_orderstatus, 'F') AS k, o_orderkey
        FROM orders WHERE o_orderkey % 100 < 2
    ), b AS (
        SELECT NULLIF(o_orderstatus, 'F') AS k, o_orderkey
        FROM orders WHERE o_orderkey % 100 >= 98
    )
    SELECT a.k, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the
    semantics a late-arriving-dimension or optional-attribute join
    needs. The nullable key is derived (NULLIF on the status column)
    so the null group is non-vacuous: a plain equi-join would lose
    those rows, and the oracle's null-keyed output row proves the
    engine kept them. eqNullSafe keys still hash-partition normally,
    so the join shape (and its scale behavior) is identical to the
    plain equi-join — nulls land in one bucket like any other key
    value."""
    od = load_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k")
    a = od.where(F.col("o_orderkey") % 100 < 2).select(k, "o_orderkey")
    b = od.where(F.col("o_orderkey") % 100 >= 98).select(
        k.alias("kb"), F.col("o_orderkey").alias("ob")
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["kb"]))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k, o_orderstatus AS s,
               epoch_us(o_orderdate) // 86400000000 AS d
        FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM o a JOIN o b
      ON a.k < b.k AND b.d BETWEEN a.d - 6 AND a.d + 6
    GROUP BY 1, 2
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join via TIME TILES: each order carries a
    7-day activity interval [d, d+6]; the result counts overlapping
    order pairs per priority pair. The naive form is an O(n^2)
    inequality join; the scale form tiles time into interval-length
    windows, assigns each interval to the (<=2) tiles it spans
    (array-side `sequence` + explode — no shuffle), and equi-joins ON
    THE TILE, so candidates are only same-tile pairs: work is
    sum(tile_size^2) ~ density x output size, never corpus^2. A pair
    overlapping in two tiles is counted ONCE — only the tile holding
    the later interval's start reports it (both intervals provably
    cover that day, and it lives in exactly one tile) — no
    distinct-pairs shuffle needed. Same bucketize-don't-nest-loop
    move as `join_range_bands` / `operators/rangejoin.py`, for the
    temporal-overlap special case (tile width >= max interval length
    guarantees every overlapping pair shares a tile). Work — and the
    TRUE result — is output-bounded: densifying a fixed time range
    (the probe's key-offset multiplication) grows overlap pairs
    quadratically by definition, while growing the time range at
    fixed density is linear; the URGENT-priority filter (pushed to
    the scan) keeps the graded pair volume batch-sized. The oracle
    is the naive inequality join (DuckDB IEJoin handles it at test
    scale)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("p"),
        # o_orderdate may read as TIMESTAMP_NTZ; session tz is pinned
        # UTC so the cast is deterministic
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("d"),
    )
    iv = o.withColumn(
        "tile",
        F.explode(
            F.sequence(
                F.floor(F.col("d") / 7), F.floor((F.col("d") + 6) / 7)
            )
        ),
    )
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tile") == F.col("b.tile"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.abs(F.col("a.d") - F.col("b.d")) <= 6)
        # dedup across tiles: report only where the later start lives
        & (
            F.col("a.tile")
            == F.floor(F.greatest(F.col("a.d"), F.col("b.d")) / 7)
        ),
    )
    return pairs.groupBy(
        F.col("a.p").alias("sa"), F.col("b.p").alias("sb")
    ).agg(F.count("*").cast("long").alias("n_pairs"))
