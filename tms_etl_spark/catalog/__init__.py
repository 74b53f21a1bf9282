"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame program with (where SQL-expressible)
an equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables. The driver hash-compares the two at sf0.01 — this registry IS
the correctness surface.

Registration:

    @query("agg_sum", oracle="SELECT ...")
    def agg_sum(spark, sf_dir) -> DataFrame: ...

Exactness conventions (see ``tms_etl_spark.catalog.exact``):

- every computed column aliased identically on both sides;
- double aggregation goes through DECIMAL so the sum is exact and
  bit-identical regardless of partition/accumulation order — a plain
  ``SUM(double)`` differs between engines in the last ulps because the
  addition order differs, and at 100 TB partition order is never
  deterministic anyway;
- top-k queries always carry a unique tie-break key so the selected
  *set* of rows is well-defined.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module (populates QUERIES/ORACLES)."""
    from tms_etl_spark.catalog import (  # noqa: F401
        aggregates,
        analytics,
        functions_ext,
        joins,
        joins_ext,
        llm_text,
        multimodal,
        relational,
        setops,
        similarity,
        stream_windows,
        tms_domain,
        windows,
    )


__all__ = ["QUERIES", "ORACLES", "query", "load_all"]
