"""Property tests for the round-8 entries beyond the oracle gate:
deadline-funnel boundary semantics, RRF dominance, MRR consistency,
mode maximality, LM-coverage bounds."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from tms_etl_spark import catalog

catalog.load_all()


def test_funnel_deadline_boundary(spark):
    """Clicks at exactly the 24h mark convert (<= bound); one
    microsecond later they don't."""
    base = dt.datetime(2024, 1, 1)
    h24 = dt.timedelta(hours=24)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: click exactly at the deadline -> converts
        (1, base, 1, "signup", 0.0, None),
        (2, base + h24, 1, "click", 0.0, None),
        (3, base + h24 + dt.timedelta(days=7), 1, "purchase", 0.0, None),
        # user 2: click one microsecond past -> funnel dies
        (4, base, 2, "signup", 0.0, None),
        (5, base + h24 + us, 2, "click", 0.0, None),
        (6, base + h24 + us + dt.timedelta(hours=1), 2, "purchase", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        row = catalog.QUERIES["funnel_time_bounded"](spark, d).collect()[0]
    assert row["n_signup"] == 2
    assert row["n_click_24h"] == 1
    assert row["n_purchase_7d"] == 1


def test_rrf_both_lists_dominate(spark, sf_dir):
    """A doc ranked by BOTH rankers at rank r scores strictly above a
    doc ranked r by only one ranker; every output doc has at least
    one rank populated."""
    rows = catalog.QUERIES["retrieval_rrf_fusion"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bm25_rank"] is not None or r["cosine_rank"] is not None
        expected = 0.0
        if r["bm25_rank"] is not None:
            expected += 1.0 / (60 + r["bm25_rank"])
        if r["cosine_rank"] is not None:
            expected += 1.0 / (60 + r["cosine_rank"])
        assert r["rrf_score"] == pytest.approx(expected, abs=1e-15)
    both = [r for r in rows if r["bm25_rank"] and r["cosine_rank"]]
    single = [r for r in rows if (r["bm25_rank"] is None) != (r["cosine_rank"] is None)]
    for b in both:
        worst = max(b["bm25_rank"], b["cosine_rank"])
        for s in single:
            only = s["bm25_rank"] or s["cosine_rank"]
            if only >= worst:
                assert b["rrf_score"] > s["rrf_score"]


def test_mrr_rows_consistent(spark, sf_dir):
    rows = catalog.QUERIES["eval_retrieval_rank"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["first_relevant_rank"] >= 1
        assert r["reciprocal_rank"] == pytest.approx(
            1.0 / r["first_relevant_rank"], abs=1e-15
        )


def test_mode_is_maximal(spark, sf_dir):
    """The modal count equals the true per-user maximum type count."""
    got = {
        r["user_id"]: r["cnt"]
        for r in catalog.QUERIES["agg_mode_per_key"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    true_max = {
        r["user_id"]: r["m"]
        for r in ev.groupBy("user_id", "event_type")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    assert got == true_max


def test_lm_coverage_bounds(spark, sf_dir):
    rows = catalog.QUERIES["text_lm_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["covered"] <= r["n_bigrams"]
        assert r["coverage"] == pytest.approx(
            r["covered"] / r["n_bigrams"], abs=1e-15
        )
