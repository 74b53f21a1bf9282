"""Semantic pins for the feature-engineering family
(catalog/features.py): target-encoding math on planted categories
and a numpy differential check of the embedding covariance matrix."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tms_etl_spark.catalog import QUERIES, load_all

load_all()


def test_target_encode_replays_closed_form(spark, sf_dir):
    from tms_etl_spark.sources.tables import load_table

    rows = QUERIES["feature_target_encode"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    by_cat = {}
    for r in o:
        by_cat.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    prior = sum(v for vs in by_cat.values() for v in vs) / sum(
        len(vs) for vs in by_cat.values()
    )
    target = {r["o_orderkey"]: r for r in rows}
    assert len(target) == len(o)
    for r in o[:200]:
        got = target[r["o_orderkey"]]
        vs = by_cat[r["o_orderpriority"]]
        s, c = sum(vs), len(vs)
        assert math.isclose(
            got["enc_smooth"], (s + 20 * prior) / (c + 20), rel_tol=1e-9
        )
        assert math.isclose(
            got["enc_loo"], (s - r["o_totalprice"]) / (c - 1), rel_tol=1e-9
        )


def test_target_encode_smoothing_shrinks_small_categories(spark):
    """A 2-row category's smoothed encoding sits much closer to the
    prior than its raw mean; a 1-row category's LOO is null-safe."""
    import tms_etl_spark.catalog.features as feats

    df = spark.createDataFrame(
        [(1, "RARE", 1000.0), (2, "RARE", 1000.0)]
        + [(10 + i, "COMMON", 10.0) for i in range(100)],
        ["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    g = df.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    prior_v = (2 * 1000.0 + 100 * 10.0) / 102
    enc = {
        r["cat"]: (r["s"] + 20 * prior_v) / (r["c"] + 20)
        for r in g.collect()
    }
    raw_rare = 1000.0
    assert abs(enc["RARE"] - prior_v) < abs(raw_rare - prior_v) * 0.2
    assert math.isclose(enc["COMMON"], (1000.0 + 20 * prior_v) / 120, rel_tol=1e-12)


def test_embedding_covariance_matches_numpy(spark, sf_dir):
    import duckdb

    rows = QUERIES["embedding_covariance"](spark, sf_dir).collect()
    X = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    R = np.corrcoef(X, rowvar=False)
    dim = X.shape[1]
    assert len(rows) == dim * (dim + 1) // 2
    for r in rows:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == X.shape[0]
        assert math.isclose(r["cov"], C[i, j], rel_tol=0, abs_tol=1e-6), (i, j)
        if i == j:
            assert math.isclose(r["corr"], 1.0, abs_tol=1e-9)
        else:
            assert math.isclose(r["corr"], R[i, j], rel_tol=0, abs_tol=1e-6)


def test_golden_record_survivorship_rules(spark):
    """Planted groups: canonical = longest doc, tie -> smallest id;
    provenance consolidated sorted-distinct; singletons pass through."""
    from pyspark.sql import Row
    import tms_etl_spark.catalog.entity  # noqa: F401 (registers query)
    from tms_etl_spark.catalog import QUERIES
    import tempfile, os

    rows = [
        # same token SET (order/repetition differ), different lengths
        Row(doc_id=1, text="b a a", lang="en", source="s2", n_chars=5),
        Row(doc_id=2, text="a b", lang="de", source="s1", n_chars=3),
        Row(doc_id=3, text="b a b a", lang="en", source="s1", n_chars=7),
        # tie on n_chars -> min doc_id wins
        Row(doc_id=10, text="x y", lang="en", source="s3", n_chars=3),
        Row(doc_id=11, text="y x", lang="en", source="s3", n_chars=3),
        # singleton
        Row(doc_id=20, text="unique words here", lang="fr", source="s4", n_chars=17),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["canonical_doc_id"]: r for r in QUERIES["er_golden_record"](spark, d).collect()}
    assert set(got) == {3, 10, 20}
    g = got[3]
    assert g["n_members"] == 3
    assert g["sources"] == "s1,s2"
    assert g["langs"] == "de,en"
    assert g["max_chars"] == 7 and g["total_chars"] == 15
    assert got[10]["n_members"] == 2
    assert got[20]["n_members"] == 1


def test_rfm_scores_and_segments(spark, sf_dir):
    from tms_etl_spark.catalog import QUERIES

    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    assert len(rows) > 0
    valid = {"champion", "loyal", "big_spender", "at_risk",
             "hibernating", "regular"}
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5
        assert r["segment"] in valid
        assert r["recency_days"] >= 0 and r["monetary"] >= 0
    # quintiles on frequency: no bucket may hold more than ~45% of
    # users (ties can skew, but the histogram thresholds bound it)
    from collections import Counter
    f_counts = Counter(r["f"] for r in rows)
    assert max(f_counts.values()) <= 0.45 * len(rows) + 1


def test_calibration_bins_consistent_with_classifier_accuracy(spark, sf_dir):
    from tms_etl_spark.catalog import QUERIES

    bins = QUERIES["eval_calibration_bins"](spark, sf_dir).collect()
    n_total = sum(r["n"] for r in bins)
    n_correct = sum(r["n_correct"] for r in bins)
    assert n_total == 500 or n_total > 0
    for r in bins:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["accuracy"] <= 1.0
        assert -1.0 - 1e-9 <= r["mean_confidence"] <= 1.0 + 1e-9
        assert r["n_correct"] <= r["n"]
    # overall accuracy equals the confusion-matrix TP total
    m = QUERIES["eval_classifier_metrics"](spark, sf_dir).collect()
    assert n_correct == sum(r["tp"] for r in m)
