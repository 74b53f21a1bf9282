"""Scale-strategy tests: salted join semantics + bucketed co-located
joins eliminating exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.operators.skew import salted_join, write_bucketed
from tms_etl_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = (
        li.join(s, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_suppkey")
        .collect()
    )
    salted = (
        salted_join(li, s, key="l_suppkey", salt=8)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_suppkey")
        .collect()
    )
    assert plain == salted


def test_salted_join_left_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_ord"))
    )
    plain = set(
        (r["c_custkey"], r["n_ord"])
        for r in c.join(o, "c_custkey", "left").collect()
    )
    salted = set(
        (r["c_custkey"], r["n_ord"])
        for r in salted_join(c, o, key="c_custkey", salt=4, how="left").collect()
    )
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    a = spark.table("li_b")
    b = spark.table("o_b")
    # hint forces a sort-merge join (tiny test data would otherwise
    # broadcast, which sidesteps bucketing entirely); with matching
    # bucketing+sortBy on both sides the SMJ needs no Exchange.
    joined = a.join(b.hint("merge"), "l_orderkey")
    p = _plan(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p  # co-located: bucket joins shuffle-free
    # and the aggregation on the bucket key is exchange-free too
    agg = a.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    # partial+final collapse into one stage when bucketed
    assert _plan(agg).count("Exchange") == 0
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
