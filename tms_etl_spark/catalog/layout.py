"""Storage-layout catalog entries: the Z-order clustering key.

The write path (`operators/layout.py:write_zordered`) is pinned by
tests (file-level z-ranges must not overlap); the gate checks the
key arithmetic itself bit-for-bit against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.layout import sql_zvalue, zorder_key
from tms_etl_spark.sources.tables import load_table

_Z_SQL = sql_zvalue("(l_partkey % 65536)", "(l_suppkey % 65536)")


@query(
    "layout_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_Z_SQL} AS BIGINT) AS zvalue
    FROM lineitem
    ORDER BY zvalue, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (partkey, suppkey) — the clustering column a
    100 TB fact table sorts by so that filters on EITHER dimension
    prune files (`operators/layout.py:zorder_key`). Top-100 by
    (zvalue, unique tie-break) = one TakeOrdered, and the bit
    arithmetic is verified against DuckDB evaluating the identical
    magic-mask interleave."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            zorder_key(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536),
        )
        .orderBy("zvalue", "l_orderkey", "l_linenumber")
        .limit(100)
    )


_H_CTE = None  # built lazily so the import stays cheap


def _hilbert_oracle() -> str:
    from tms_etl_spark.operators.layout import sql_hilbert_cte

    inner = sql_hilbert_cte(
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem",
        "l_partkey % 65536",
        "l_suppkey % 65536",
        bits=16,
    )
    return (
        f"SELECT l_orderkey, l_linenumber, hvalue FROM ({inner})\n"
        "ORDER BY hvalue, l_orderkey, l_linenumber LIMIT 100"
    )


@query("layout_hilbert_key", oracle=_hilbert_oracle())
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve key over (partkey, suppkey) — the
    better-locality sibling of `layout_zorder_key`: consecutive keys
    are always grid-adjacent, so clustered files carry tighter
    min/max ranges on both dimensions
    (`operators/layout.py:with_hilbert_key` — two broadcast joins
    against the precomputed 8-bit FSM tile table, whole-stage
    codegen'd; the pure-Column fold `hilbert_key` is the portable
    slow form, equality pinned in tests). The oracle runs the
    identical integer arithmetic as a chain of per-level CTEs —
    bit-for-bit comparable."""
    from tms_etl_spark.operators.layout import with_hilbert_key

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    keyed = with_hilbert_key(
        li, F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536
    )
    return (
        keyed.select("l_orderkey", "l_linenumber", "hvalue")
        .orderBy("hvalue", "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "layout_zonemap_stats",
    oracle="""
    SELECT CAST(l_orderkey // 1000 AS BIGINT) AS zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           (MAX(l_shipdate) >= DATE '1994-01-01'
            AND MIN(l_shipdate) <= DATE '1994-12-31') AS survives_1994
    FROM lineitem
    GROUP BY 1
    """,
)
def layout_zonemap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping) statistics: per ingest-order block of
    1000 orderkeys — the model of a parquet row-group / file — the
    min/max of l_shipdate and whether a ship-year predicate could
    prune it. On time-correlated ingest the zones are tight and most
    prune; on shuffled ingest every zone survives — which is exactly
    the measurement that justifies the Z-order/Hilbert rewrite
    (`layout_zorder_key`). One map-side-combined aggregation; the
    zone table is |rows|/1000, never collected."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_orderkey") / 1000).alias("zone_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .select(
            "zone_id",
            "n_rows",
            "min_ship",
            "max_ship",
            (
                (F.col("max_ship") >= F.lit("1994-01-01").cast("date"))
                & (F.col("min_ship") <= F.lit("1994-12-31").cast("date"))
            ).alias("survives_1994"),
        )
    )


@query(
    "audit_partition_checksums",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
             AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(concat('0x',
                    substr(md5(concat_ws('|',
                        CAST(l_orderkey AS VARCHAR),
                        CAST(l_partkey AS VARCHAR),
                        CAST(l_suppkey AS VARCHAR),
                        CAST(l_linenumber AS VARCHAR))), 1, 12))
                AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
             AS content_checksum
    FROM lineitem
    GROUP BY 1
    """,
)
def audit_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-integrity audit: per ship-month partition, the row
    count and an order-INDEPENDENT content checksum (sum of
    per-row md5-prefix values through DECIMAL(38,0), so the total
    is exact and identical no matter how rows are partitioned or
    ordered) — the artifact two clusters compare after a
    replication/migration to prove a 100 TB table transferred
    bit-faithfully without ever co-locating the data. One map-side-
    combined aggregation; the audit table is |partitions|-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    row_hash = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(row_hash)
        .cast("decimal(38,0)")
        .cast("string")
        .alias("content_checksum"),
    )
