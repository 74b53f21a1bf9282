"""Unit pins for the retrieval family (operators/retrieval.py):
BM25 ranking semantics, TF-IDF cosine self-consistency, and the
fixed-width property of hashing-trick features.

The cross-engine value contract is covered by the parametrized
oracle sweep in test_catalog_oracle.py; these tests pin the
*semantics* on planted inputs where the right answer is computable
by hand.
"""

from __future__ import annotations

import math

from tms_etl_spark.operators.retrieval import (
    bm25_topk,
    hash_features,
    tfidf_cosine_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranks_higher_tf_first(spark):
    """With equal lengths and one query term, more occurrences of
    the term must score strictly higher (tf saturation is monotone)."""
    docs = _docs(
        spark,
        [
            (1, "spark spark spark pad pad pad"),
            (2, "spark spark pad pad pad pad"),
            (3, "spark pad pad pad pad pad"),
            (4, "pad pad pad pad pad pad"),
        ],
    )
    got = bm25_topk(docs, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in got] == [1, 2, 3]
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) == 3


def test_bm25_length_normalization_prefers_shorter(spark):
    """Same tf, different doc length: the shorter document scores
    higher (b > 0 penalizes length)."""
    docs = _docs(
        spark,
        [
            (1, "spark pad"),
            (2, "spark pad pad pad pad pad pad pad pad pad"),
        ],
    )
    got = bm25_topk(docs, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in got] == [1, 2]


def test_bm25_replays_python_formula(spark):
    """Bit-replay of the closed-form score on a tiny corpus."""
    texts = {
        1: "spark merge merge pad",
        2: "spark pad pad pad pad",
        3: "pad pad pad",
    }
    docs = _docs(spark, list(texts.items()))
    got = {r["doc_id"]: r["score"] for r in bm25_topk(
        docs, ["spark", "merge"], k=10
    ).collect()}

    lens = {d: len(t.split()) for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(lens.values()) / n
    tf = {
        (d, w): texts[d].split().count(w)
        for d in texts
        for w in ("spark", "merge")
    }
    df = {
        w: sum(1 for d in texts if tf[(d, w)] > 0) for w in ("spark", "merge")
    }
    expect = {}
    for d in texts:
        s = 0.0
        for w in ("spark", "merge"):
            t = tf[(d, w)]
            if t == 0:
                continue
            idf = (n + 1.0) / df[w]
            s += idf * (t * (1.2 + 1.0)) / (
                t + 1.2 * ((1.0 - 0.75) + 0.75 * lens[d] / avgdl)
            )
        if s > 0:
            expect[d] = round(s, 6)
    assert set(got) == set(expect)
    for d in expect:
        assert math.isclose(got[d], expect[d], rel_tol=0, abs_tol=5e-7), d


def test_tfidf_cosine_identical_doc_is_top_and_near_one(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),
            (2, "alpha beta zzz yyy"),
            (3, "qqq www eee rrr"),
        ],
    )
    got = tfidf_cosine_topk(docs, query_doc_id=0, k=10).collect()
    assert got[0]["doc_id"] == 1
    assert abs(got[0]["cosine"] - 1.0) < 1e-9
    by_id = {r["doc_id"]: r["cosine"] for r in got}
    assert by_id[1] > by_id[2]
    assert 3 not in by_id or by_id[3] < by_id[2]


def test_hash_features_width_bounded_and_deterministic(spark, sf_dir):
    from tms_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = hash_features(docs, n_buckets=16)
    rows = feats.collect()
    assert all(0 <= r["bucket"] < 16 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += 1
    assert max(per_doc.values()) <= 16
    # |feature| can never exceed the tokens that landed in the bucket
    assert all(abs(r["feature"]) <= r["n_tokens"] for r in rows)
    again = {
        (r["doc_id"], r["bucket"]): r["feature"]
        for r in hash_features(docs, n_buckets=16).collect()
    }
    assert {(r["doc_id"], r["bucket"]): r["feature"] for r in rows} == again
