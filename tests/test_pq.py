"""Product quantization: encode determinism, ADC-vs-numpy-replay
exactness, exact-reconstruction identity, and Lloyd refinement
improving quantization error."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tms_etl_spark.operators.pq import (
    adc_cosine,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


def _vectors(n, d, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, d).round(3)


@pytest.fixture(scope="module")
def emb(spark):
    vs = _vectors(60, 16)
    return spark.createDataFrame(
        [(i, [float(x) for x in vs[i]]) for i in range(len(vs))],
        "vec_id int, embedding array<double>",
    )


def test_encode_matches_numpy_replay(spark, emb):
    books = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=0)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    ds = 4
    for vid, v in rows.items():
        v = np.asarray(v)
        expect = []
        for j in range(4):
            sub = v[j * ds : (j + 1) * ds]
            bm = np.asarray(books[j])
            dist = ((bm - sub[None, :]) ** 2).sum(axis=1)
            expect.append(int(np.argmin(dist)))
        assert got[vid] == expect, vid


def test_adc_equals_reconstruction_cosine(spark, emb):
    """ADC cosine == numpy cosine(query, decoded reconstruction) —
    the subspace decomposition makes ADC exact over reconstructions,
    not an approximation of them."""
    books = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=1)
    q = [float(x) for x in _vectors(1, 16, seed=99)[0]]
    enc = pq_encode(emb, books)
    got = {
        r["vec_id"]: r["adc_cos"]
        for r in adc_cosine(enc, q, books).collect()
    }
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    qv = np.asarray(q)
    for vid, cs in codes.items():
        recon = np.concatenate([np.asarray(books[j][c]) for j, c in enumerate(cs)])
        expect = float(
            qv @ recon / (np.linalg.norm(qv) * np.linalg.norm(recon))
        )
        assert abs(got[vid] - expect) < 1e-9, vid


def test_exact_reconstruction_scores_one(spark, emb):
    """A corpus vector whose subvectors ARE codebook centroids
    reconstructs exactly, so querying with it scores itself 1."""
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    target = rows[5]
    ds = 4
    books = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=0)
    # plant the target's subvectors as code 0 of every subspace
    books = [
        [list(target[j * ds : (j + 1) * ds])] + book[1:]
        for j, book in enumerate(books)
    ]
    top = pq_topk(emb, list(target), k=1, codebooks=books).head()
    assert top["vec_id"] == 5 or top["cos_sim"] >= 1.0 - 1e-9
    assert top["cos_sim"] >= 1.0 - 1e-9


def test_lloyd_reduces_quantization_error(spark, emb):
    """One Lloyd round must not worsen (and on this data improves)
    mean squared reconstruction error vs raw seeds."""

    def mse(books):
        codes = {
            r["vec_id"]: r["codes"]
            for r in pq_encode(emb, books).collect()
        }
        rows = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}
        errs = []
        for vid, cs in codes.items():
            recon = np.concatenate(
                [np.asarray(books[j][c]) for j, c in enumerate(cs)]
            )
            errs.append(float(((rows[vid] - recon) ** 2).sum()))
        return sum(errs) / len(errs)

    seeds = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=0)
    refined = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=1)
    assert mse(refined) <= mse(seeds) + 1e-12


def test_adc_plan_is_jvm_side_takeordered(spark, emb):
    """The scoring path compiles to TakeOrderedAndProject with no
    Python evaluation after the encode stage."""
    books = train_pq_codebooks(emb, m=4, ksub=8, lloyd_iters=0)
    q = [float(x) for x in _vectors(1, 16, seed=3)[0]]
    enc = pq_encode(emb, books, vec_col="embedding")
    plan = (
        adc_cosine(enc, q, books)
        .select("vec_id", "adc_cos")
        .orderBy("adc_cos")
        .limit(5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # exactly one Python stage: the mapInPandas encode
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
