"""Extended function coverage (SURVEY.md §2.8 F6/F13/F14/F16/F17,
§2.10 U6, §2.5 W2): pivot, explode/posexplode, array & map functions,
regex extraction, null handling, deterministic math, distribution
window functions, min_by/max_by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): one column per pivot value, computed
    in a single pass (Spark rewrites to conditional aggregates —
    exactly the oracle's CASE WHEN form)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "explode_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(generate_subscripts(arr, 1) - 1 AS INT) AS pos,
           unnest(arr) AS tok
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
          FROM documents WHERE doc_id < 50) t
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6/F17: posexplode of a JVM-side split — the lateral-view
    pattern; generation happens map-side, no shuffle."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )


@query(
    "array_functions",
    oracle=r"""
    SELECT doc_id,
           CAST(len(arr) AS INT) AS n_tok,
           list_contains(arr, 'spark') AS has_spark,
           arr[1] AS first_tok,
           arr[-1] AS last_tok,
           list_sort(list_distinct(arr))[1] AS min_tok,
           array_to_string(list_sort(list_distinct(arr))[1:3], ',') AS top3
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
          FROM documents WHERE doc_id < 100) t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: array surface — size/contains/element_at/sort/slice/join,
    all JVM built-ins (codegen'd, no UDF)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    arr = F.split(F.trim("text"), r"\s+")
    sorted_distinct = F.array_sort(F.array_distinct(arr))
    return d.select(
        "doc_id",
        F.size(arr).alias("n_tok"),
        F.array_contains(arr, "spark").alias("has_spark"),
        F.element_at(arr, 1).alias("first_tok"),
        F.element_at(arr, -1).alias("last_tok"),
        F.element_at(sorted_distinct, 1).alias("min_tok"),
        F.array_join(F.slice(sorted_distinct, 1, 3), ",").alias("top3"),
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT)
             AS distinct_k,
           max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: JSON→map parsing + aggregation over map values
    (from_json to map<string,string>, element access)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select("event_type", m.alias("m")).groupBy("event_type").agg(
        F.countDistinct(F.element_at("m", "k")).alias("distinct_k"),
        F.max(F.element_at("m", "k").try_cast("bigint")).alias("max_k"),
    )


@query(
    "regex_extract",
    oracle=r"""
    SELECT doc_id, source,
           TRY_CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num,
           regexp_matches(text, 'data\s+\w+') AS mentions_data
    FROM documents
    """,
)
def regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: regex group extraction + boolean match (reference: month
    regexes and error scraping, /root/reference/src/main_02.py:608,374)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.regexp_extract("source", r"src(\d+)", 1).try_cast("bigint").alias("src_num"),
        F.col("text").rlike(r"data\s+\w+").alias("mentions_data"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT doc_id,
           NULLIF(lang, 'en') AS lang_non_en,
           COALESCE(NULLIF(lang, 'en'), 'english') AS lang_label,
           CASE WHEN lang IS NULL THEN 'missing' ELSE 'present' END AS lang_state,
           IFNULL(NULLIF(source, 'src0'), 'default_src') AS source_norm
    FROM documents
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F16: nullif/coalesce/ifnull — the reference's ''-vs-NULL
    coercion discipline (/root/reference/src/main_01.py:447-449)
    generalized."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.nullif("lang", F.lit("en")).alias("lang_non_en"),
        F.coalesce(F.nullif("lang", F.lit("en")), F.lit("english")).alias(
            "lang_label"
        ),
        F.when(F.col("lang").isNull(), "missing")
        .otherwise("present")
        .alias("lang_state"),
        F.ifnull(F.nullif("source", F.lit("src0")), F.lit("default_src")).alias(
            "source_norm"
        ),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sqrt(l_extendedprice) AS sqrt_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor,
           CAST(l_quantity AS BIGINT) % 5 AS q_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           power(l_discount, 2) AS disc_sq
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: deterministic math subset — sqrt/abs/ceil/floor/mod/sign/
    integer powers are correctly-rounded IEEE ops identical across
    engines (transcendentals like ln/exp are libm-dependent and are
    deliberately NOT oracle-checked)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("q_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("q_floor"),
        (F.col("l_quantity").cast("bigint") % 5).alias("q_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: distribution window functions (percent_rank/cume_dist/
    ntile) over a unique total order."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W5: first/last/nth value over a deterministic order (full
    frame for last_value — the default running frame is a classic
    correctness trap, made explicit here)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           max(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS newest_order,
           max(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS oldest_order
    FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                 AS rn_desc,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_asc
        FROM orders) t
    GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W1: max_by/min_by (argmax) with a composite ordering key so
    date ties break deterministically on the unique orderkey."""
    o = load_table(spark, sf_dir, "orders")
    ordkey = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordkey).alias("newest_order"),
        F.min_by("o_orderkey", ordkey).alias("oldest_order"),
    )


@query(
    "union_all_counts",
    oracle="""
    SELECT kind, COUNT(*) AS n FROM (
        SELECT 'big_order' AS kind FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT 'urgent' FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'open' FROM orders WHERE o_orderstatus = 'O'
    ) t GROUP BY kind
    """,
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 (ALL variant): union of tagged slices — multiplicities kept."""
    o = load_table(spark, sf_dir, "orders")
    parts = [
        o.where(F.col("o_totalprice") > 300000).select(F.lit("big_order").alias("kind")),
        o.where(F.col("o_orderpriority") == "1-URGENT").select(
            F.lit("urgent").alias("kind")
        ),
        o.where(F.col("o_orderstatus") == "O").select(F.lit("open").alias("kind")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.groupBy("kind").agg(F.count("*").alias("n"))


@query(
    "explode_outer_tokens",
    oracle=r"""
    SELECT d.doc_id, u.tok
    FROM (SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0 THEN NULL
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS arr
          FROM documents WHERE doc_id < 200) d
    LEFT JOIN LATERAL (SELECT unnest(d.arr) AS tok) u ON true
    """,
)
def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/U6: explode_outer — rows with a null array survive with a
    null element (the LEFT JOIN LATERAL semantics), where plain
    explode would drop them."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    arr = F.when(F.col("doc_id") % 50 == 0, F.lit(None)).otherwise(
        F.split(F.trim("text"), r"\s+")
    )
    return d.select("doc_id", F.explode_outer(arr).alias("tok"))
