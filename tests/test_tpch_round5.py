"""Round-5 additions: TPC-H Q7/Q8/Q9/Q13/Q15/Q17/Q21 plan shapes and
the leakage-safe split / k-fold / centroid training operators.
Value correctness is the oracle sweep's job (test_catalog_oracle.py);
these tests pin the physical plans and the operator invariants the
oracles can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark import catalog
from tms_etl_spark.operators.storage import kfold_assign, leakage_safe_split

catalog.load_all()


def _plan(spark, sf_dir, name) -> str:
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q7_dims_broadcast_one_fact_shuffle_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "q7_volume_shipping")
    # supplier/customer nation-region chains broadcast; lineitem↔orders
    # is the only join allowed to shuffle
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 2
    # the shipdate window reaches the fact scan
    assert "PushedFilters" in p and "l_shipdate" in p


def test_q8_share_is_single_grouped_pass(spark, sf_dir):
    p = _plan(spark, sf_dir, "q8_market_share")
    # conditional + total volume in ONE aggregation over ONE pass of
    # the fact — the lineitem scan appears exactly once (its Location
    # line shows up once in the plan details)
    fact_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(fact_scans) == 1
    assert p.count("HashAggregate") >= 2


def test_q13_outer_join_keeps_zero_order_customers(spark, sf_dir):
    out = catalog.QUERIES["q13_customer_distribution"](spark, sf_dir)
    dist = {r["c_count"]: r["custdist"] for r in out.collect()}
    # join-side filter semantics: customers with only urgent orders
    # still appear, in the c_count=0 bucket (synthetic data always has
    # some); total customers preserved
    from tms_etl_spark.sources.tables import load_table

    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(dist.values()) == n_cust


def test_q15_revenue_view_computed_once_max_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "q15_top_supplier")
    # the max is a 1-row broadcast against the reused aggregate — the
    # argmax must not introduce a global sort
    assert "TakeOrderedAndProject" not in p or "Sort " not in p
    assert p.count("BroadcastNestedLoopJoin") + p.count("BroadcastHashJoin") >= 1


def test_q17_per_part_threshold_broadcasts(spark, sf_dir):
    p = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    # brand part list AND the per-part average both broadcast; the
    # fact is never shuffled on partkey for the threshold join
    assert p.count("BroadcastHashJoin") >= 2


def test_q21_aggregate_formulation_two_shuffles(spark, sf_dir):
    p = _plan(spark, sf_dir, "q21_waiting_suppliers")
    # the witness conditions ride ONE groupBy(orderkey) — lineitem is
    # read at most twice (stats pass + late-rows pass), never the
    # naive three witness self-joins
    fact_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(fact_scans) <= 2
    assert p.count("HashAggregate") >= 2


def test_leakage_safe_split_never_splits_duplicates(spark):
    rows = [(i, f"doc body {i % 7}") for i in range(200)]  # 7 dup groups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakage_safe_split(df, "doc_id", "text")
    # every duplicate group lands wholly on one side
    n_mixed = (
        out.groupBy("text")
        .agg(F.count_distinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert n_mixed == 0
    # and the split column survives with all rows
    assert out.count() == 200


def test_leakage_safe_split_is_deterministic(spark):
    rows = [(i, f"t{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(df, "doc_id", "text").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(df.repartition(7), "doc_id", "text").collect()
    }
    assert a == b


def test_kfold_partitions_and_is_growth_stable(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = kfold_assign(df, "doc_id", k=5)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5))
    # growth stability: adding rows never moves an existing row's fold
    bigger = kfold_assign(
        spark.range(0, 2000).withColumnRenamed("id", "doc_id"), "doc_id", k=5
    )
    small = {r["doc_id"]: r["fold"] for r in out.collect()}
    big = {r["doc_id"]: r["fold"] for r in bigger.collect()}
    assert all(big[k] == v for k, v in small.items())


def test_centroid_reassembles_to_vectors(spark, sf_dir):
    # the catalog entry emits long form; pin the array re-assembly
    long_form = catalog.QUERIES["embedding_centroid_per_label"](spark, sf_dir)
    vecs = (
        long_form.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
                lambda s: s["centroid"],
            ).alias("centroid_vec")
        )
    )
    rows = vecs.collect()
    dims = {len(r["centroid_vec"]) for r in rows}
    assert dims == {64}
    # centroid of a label must equal the plain mean of its members
    from tms_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    one = rows[0]
    members = emb.where(F.col("label") == one["label"]).select("embedding").collect()
    import numpy as np

    expect = np.mean([m["embedding"] for m in members], axis=0)
    got = np.array(one["centroid_vec"])
    assert np.allclose(expect, got, atol=1e-6)


def test_q2_argmin_is_window_not_self_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "q2_min_cost_supplier")
    # per-part cheapest supplier must be rank-1 window, not a
    # min-subquery self-join of the offers
    assert "RunningWindowFunction" in p or "Window" in p
    offer_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(offer_scans) == 1


def test_q11_threshold_is_broadcast_over_derived_agg(spark, sf_dir):
    # the global total aggregates the FIRST aggregation's output; the
    # static plan prints the fact subtree twice, but AQE's exchange
    # reuse makes the second an actual ReusedExchange at runtime —
    # execute, then assert on the final adaptive plan
    df = catalog.QUERIES["q11_important_parts"](spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "isFinalPlan=true" in p
    assert p.count("ReusedExchange") >= 1
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_q12_single_pass_conditional_tallies(spark, sf_dir):
    p = _plan(spark, sf_dir, "q12_shipmode_priority")
    assert p.count("HashAggregate") >= 2  # partial + final, one pass
    assert "PushedFilters" in p and "l_shipdate" in p


def test_q20_semi_join_chain_never_duplicates(spark, sf_dir):
    out = catalog.QUERIES["q20_promotable_suppliers"](spark, sf_dir)
    rows = out.collect()
    # semi-join semantics: each supplier appears at most once
    names = [r["s_name"] for r in rows]
    assert len(names) == len(set(names))
    p = _plan(spark, sf_dir, "q20_promotable_suppliers")
    assert "LeftSemi" in p


def test_corpus_prep_pipeline_single_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "corpus_prep_pipeline")
    # gates fused into the scan; dedup window is the only exchange
    # (plus its AQE read) — no second data shuffle for the split
    exchanges = [ln for ln in p.splitlines() if ln.strip().startswith("(") is False and "Exchange" in ln and "Reused" not in ln]
    assert p.count("Exchange hashpartitioning") <= 2  # tree + details of ONE exchange
    assert "PushedFilters" in p and "n_chars" in p
