"""Scans, projections, filters, scalar functions, sorts (SURVEY §2.1/2.2/2.6/2.8).

Every query here compiles to a plan where the filter and the column
projection reach the parquet scan (``PushedFilters`` / ``ReadSchema``
in ``explain("formatted")``) — verified by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import (
    davg,
    dec8,
    dsum,
    sql_davg,
    sql_dsum,
    sql_dsum8,
)
from tms_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------- flagship
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum8("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum8("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the engine's flagship.

    Reference analog: the per-file OK/error roll-up + grouped summary
    tree (/root/reference/src/main_01.py:1141-1164,
    /root/reference/src/main_02.py:823-900) generalized to a grouped
    multi-aggregate over the fact table.

    Scale notes: filter pushes to the parquet scan; the two grouping
    columns have tiny cardinality so the partial (map-side) hash
    aggregation collapses almost all rows before the single shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(dec8(disc_price)), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(dec8(charge)), 4).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------- scan / project / filter
@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11+P1+P8: projection & predicate pushed into the parquet scan
    (reference: positional projection + arity filter,
    /root/reference/src/main_01.py:334-364,:403-404)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 45)
        & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_null_coerce_json",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_val
    FROM events
    WHERE event_type = 'click'
    """,
)
def filter_null_coerce_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+F17: ``float(x or 0)``-style coercion
    (/root/reference/src/main_01.py:447-449) as
    ``coalesce(try_cast(...), 0)``, over a JSON-extracted field."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "click").select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.k").try_cast("bigint"), F.lit(0).cast("bigint")
        ).alias("k_val"),
    )


@query(
    "case_when_bucket",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: CASE WHEN dispatch (reference: status→color/icon,
    /root/reference/src/main_01.py:922-936)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return ev.groupBy(bucket).agg(
        F.count("*").alias("n"), dsum("value", "total_value")
    )


# ------------------------------------------------------- scalar functions
@query(
    "string_functions",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_uc,
           substring(text, 1, 20) AS prefix,
           length(text) AS text_len,
           concat(lang, '-', source) AS lang_source,
           replace(source, 'src', 'S') AS source_norm,
           CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS has_spark
    FROM documents
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4/F5/F7/F8/F15: trim/substr/replace/upper/concat/contains
    (reference sites cited in SURVEY.md §2.8)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.substring("text", 1, 20).alias("prefix"),
        F.length("text").cast("long").alias("text_len"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
        F.regexp_replace("source", "src", "S").alias("source_norm"),
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("has_spark"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day_str,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
           datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_since
    FROM events
    WHERE event_type = 'signup'
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10/F12: date formatting, truncation, epoch, date arithmetic
    (reference: strftime/timedelta sites, /root/reference/src/main_01.py:1119-1121,
    /root/reference/src/tms_colector.py:168)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "signup").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.unix_timestamp("ts").alias("unix_s"),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias(
            "days_since"
        ),
    )


@query(
    "month_normalize",
    oracle="""
    SELECT DISTINCT
           strftime(o_orderdate, '%Y.%m') AS month_dot,
           replace(strftime(o_orderdate, '%Y.%m'), '.', '-') AS month_dash,
           CAST(date_trunc('month', o_orderdate) - INTERVAL 1 MONTH AS TIMESTAMP)
             AS prev_month_start
    FROM orders
    """,
)
def month_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5+F11: the reference's three month formats (YYYY.MM/YYYY-MM)
    interconverted (/root/reference/src/main_02.py:399) and the
    year-rollover-aware previous-month (/root/reference/src/tms_exporter.py:18-29)
    via ``add_months(trunc(month), -1)``."""
    o = load_table(spark, sf_dir, "orders")
    month_dot = F.date_format("o_orderdate", "yyyy.MM").alias("month_dot")
    return o.select(
        month_dot,
        F.translate(F.date_format("o_orderdate", "yyyy.MM"), ".", "-").alias(
            "month_dash"
        ),
        F.add_months(F.date_trunc("month", "o_orderdate"), -1)
        .cast("timestamp")
        .alias("prev_month_start"),
    ).distinct()


# ------------------------------------------------------------ sort / top-k
@query(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O4: global top-k with a unique tie-break so the selected set
    is deterministic (reference: top-2 months,
    /root/reference/src/main_02.py:226-232). Spark executes this as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(100)
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: distinct (reference: month-set dedup,
    /root/reference/src/main_02.py:241). Partial-aggregate collapses
    duplicates map-side before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()
