"""Property tests for the sequence-analytics family and the
scale-pattern joins (salted skew join, Bloom prefilter, incremental
Bloom dedup) — invariants the DuckDB oracle can't express, plus the
map-only plan guarantee of the Bloom probe."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tms_etl_spark import catalog

catalog.load_all()


def test_markov_rows_sum_to_one(spark, sf_dir):
    """Outgoing transition probabilities form a distribution per
    source event type."""
    res = catalog.QUERIES["path_markov_transitions"](spark, sf_dir)
    sums = (
        res.groupBy("event_type")
        .agg(F.sum("prob").alias("s"), F.sum("cnt").alias("n"))
        .collect()
    )
    assert sums
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-9)
        assert r["n"] > 0


def test_journeys_shape(spark, sf_dir):
    """Every journey has at most 3 steps and the top-20 user total
    can't exceed the distinct-user count."""
    res = catalog.QUERIES["path_topk_journeys"](spark, sf_dir).collect()
    assert 0 < len(res) <= 20
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["users"] for r in res) <= n_users
    for r in res:
        assert 1 <= len(r["journey"].split(">")) <= 3


def test_bounce_rate_consistency(spark, sf_dir):
    res = catalog.QUERIES["session_bounce_rate"](spark, sf_dir).collect()
    assert res
    for r in res:
        assert 0 <= r["bounces"] <= r["sessions"]
        assert r["bounce_rate"] == pytest.approx(
            r["bounces"] / r["sessions"], abs=1e-12
        )


def test_ewma_planted_single_user(spark):
    """Planted 3-event series: ewma_3 = v3 + v2/2 + v1/4 exactly."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "a", 1.0, None),
        (2, base + dt.timedelta(minutes=1), 7, "a", 2.0, None),
        (3, base + dt.timedelta(minutes=2), 7, "a", 4.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        res = {
            r["event_id"]: r["ewma16"]
            for r in catalog.QUERIES["ts_ewma_decay"](spark, d).collect()
        }
    assert res[1] == 1.0
    assert res[2] == 2.0 + 0.5
    assert res[3] == 4.0 + 1.0 + 0.25


def test_salted_join_equals_plain(spark, sf_dir):
    """Salting must never change the answer: compare against the
    straightforward Spark join."""
    from tms_etl_spark.catalog.exact import dsum
    from tms_etl_spark.sources.tables import load_table

    got = {
        r["o_orderpriority"]: (r["n_lines"], r["sum_qty"], r["sum_price"])
        for r in catalog.QUERIES["join_skew_salted"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    plain = {
        r["o_orderpriority"]: (r["n_lines"], r["sum_qty"], r["sum_price"])
        for r in li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
        )
        .collect()
    }
    assert got == plain


def test_bloom_probe_is_map_only(spark, sf_dir):
    """The Bloom probe must add ZERO exchanges — the entire point of
    prefiltering before the shuffle."""
    from tms_etl_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
        pack_bloom,
    )
    from tms_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") >= 40)
        .select(F.col("p_partkey").alias("k"))
        .distinct()
    )
    words = pack_bloom(build_bloom(keys, "k", 1 << 14, 5), 1 << 14)
    probed = bloom_probe(words, li, "l_partkey", 1 << 14, 5).where(
        F.col("bloom_hit")
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_incremental_bloom_no_false_drops(spark, sf_dir):
    """Result equals the exact anti-join — the Bloom routing may
    split the work but never change membership."""
    from tms_etl_spark.sources.tables import load_table

    got = {
        r["doc_id"]
        for r in catalog.QUERIES["dedup_incremental_bloom"](
            spark, sf_dir
        ).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("k")
    )
    existing = docs.where(F.col("doc_id") % 10 < 8).select("k").distinct()
    expected = {
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 10 >= 8)
        .join(existing, "k", "left_anti")
        .collect()
    }
    assert got == expected


def test_gini_bounds(spark, sf_dir):
    res = catalog.QUERIES["profile_categorical_gini"](spark, sf_dir).collect()
    assert len(res) == 5
    for r in res:
        assert 0.0 <= r["gini_impurity"] < 1.0
        assert r["n_distinct"] <= r["n_rows"]
        # k equiprobable values bound: gini <= 1 - 1/k
        assert r["gini_impurity"] <= 1.0 - 1.0 / r["n_distinct"] + 1e-12


def test_dataset_card_shares_sum_to_one(spark, sf_dir):
    res = catalog.QUERIES["dataset_card_stats"](spark, sf_dir).collect()
    assert res
    assert sum(r["doc_share"] for r in res) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["token_share"] for r in res) == pytest.approx(1.0, abs=1e-9)
