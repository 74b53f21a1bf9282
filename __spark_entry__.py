"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(``tms_etl_spark.catalog``): every implemented operator from
SURVEY.md §2 registers a (Spark program, DuckDB oracle SQL) pair
there; this module just exposes the registry to the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Executor Python workers inherit PYTHONPATH; make the engine package
# importable there too (any remaining Python-side functions ship
# self-contained closures, this is defense in depth).
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from tms_etl_spark import catalog  # noqa: E402

catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return catalog.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog query."""
    return dict(catalog.ORACLES)
