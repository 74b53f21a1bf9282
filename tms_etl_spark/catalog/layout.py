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
