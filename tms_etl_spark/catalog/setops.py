"""Set operations (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table


def _typed(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == etype).select("user_id")


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: union+distinct (reference: month-set union across 3 kinds,
    /root/reference/src/main_02.py:241)."""
    return (
        _typed(spark, sf_dir, "click")
        .unionByName(_typed(spark, sf_dir, "view"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: intersect — users seen on both sides."""
    return _typed(spark, sf_dir, "purchase").intersect(
        _typed(spark, sf_dir, "error")
    )


@query(
    "set_except",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: except (distinct) — (user, day) pairs with a click but no
    purchase. Day-level, not user-level: at sf0.01 every user has
    every event type, so a user-level EXCEPT matches its oracle on 0
    rows — false comfort (round-1 VERDICT item 3). 1010 rows at
    sf0.01. ``subtract`` is Spark's EXCEPT DISTINCT; ``exceptAll``
    would keep surplus multiplicities and diverge from SQL EXCEPT."""

    def typed_days(etype: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return ev.where(F.col("event_type") == etype).select(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )

    return typed_days("click").subtract(typed_days("purchase"))


@query(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: intersect all — multiplicity = min(count_a, count_b)."""
    return _typed(spark, sf_dir, "purchase").intersectAll(
        _typed(spark, sf_dir, "error")
    )


@query(
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: except all — per-occurrence subtraction."""
    return _typed(spark, sf_dir, "click").exceptAll(
        _typed(spark, sf_dir, "purchase")
    )
