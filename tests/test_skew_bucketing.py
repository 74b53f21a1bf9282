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


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A month-partitioned fact joined to a filtered dim must get a
    runtime partition-pruning subquery on the fact scan (DPP) — at
    100 TB this is the difference between scanning one month and
    scanning the table."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    fact_path = str(tmp_path / "li_by_month")
    li.write.partitionBy("ship_month").mode("overwrite").parquet(fact_path)
    # DPP requires a file-based dim with a SELECTIVE predicate — a
    # literal LocalRelation never qualifies
    dim_path = str(tmp_path / "month_dim")
    li.select("ship_month").distinct().withColumn(
        "tag",
        F.when(F.col("ship_month") == "1994-03", "target").otherwise(
            "other"
        ),
    ).write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "target")
    q = fact.join(dim, "ship_month").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = _plan(q)
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """A pathologically hot join key must be split by AQE's skew-join
    handling at runtime (skew=true in the final adaptive plan), not
    serialized onto one reducer."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    old["spark.sql.adaptive.skewJoin.skewedPartitionFactor"] = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", None
    )
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # 200k rows on ONE key vs a uniform right side; collect the
        # JOIN itself so its own AdaptiveSparkPlan finalizes
        left = spark.range(200_000).select(
            F.lit(7).alias("k"),
            (F.col("id") * F.lit(1234567)).alias("payload"),
        ).unionAll(
            spark.range(2_000).select(
                (F.col("id") % 64).alias("k"), F.col("id").alias("payload")
            )
        )
        right = spark.range(64).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 202_000
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injected_on_big_join(spark, sf_dir):
    """When neither join side broadcasts, Spark can inject a runtime
    bloom filter from the filtered side into the big side's scan
    (might_contain in the plan) — at 100 TB this drops most fact rows
    BEFORE the shuffle instead of after the join."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
    )
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderstatus") == "F"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.sum("l_quantity").alias("q")
        )
        p = _plan(j)
        assert "might_contain" in p, p[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
