"""SQL-text API surface: the engine's tables are queryable with raw
ANSI SQL through ``spark.sql`` over registered temp views — the same
Catalyst plans the DataFrame API produces, so a reference user who
lives in SQL can switch without learning the DataFrame DSL.

The entry runs a realistic multi-clause SQL text (CTE + join + agg +
HAVING + window) end-to-end through the SQL parser; its oracle is the
DuckDB translation of the same statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table


@query(
    "sql_text_api",
    oracle="""
    WITH cust_orders AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_value,
           CAST(rank() OVER (
               ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,4))) DESC,
                        segment) AS BIGINT) AS value_rank
    FROM cust_orders
    GROUP BY segment
    HAVING COUNT(*) > 10
    """,
)
def sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL front door: views registered once, then a CTE +
    broadcast join + decimal-exact aggregate + HAVING + rank window —
    all parsed from SQL text by Catalyst into the same physical plan
    the DataFrame entries get (pushdown, partial agg, broadcast
    included). Views are session-scoped metadata; nothing is
    materialized."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice
            FROM customer_v c JOIN orders_v o ON o.o_custkey = c.c_custkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_value,
               CAST(rank() OVER (
                   ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,4))) DESC,
                            segment) AS BIGINT) AS value_rank
        FROM cust_orders
        GROUP BY segment
        HAVING COUNT(*) > 10
        """
    )
