"""Round-3 batch 3: training-data pipeline operators (packing,
mixture sampling, quantile filter, decontamination, inverted index) —
Python recomputations of each rule plus plan assertions for the
claimed shapes (broadcast rate/gram tables; one exchange to pack)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import functions as F

from tms_etl_spark.catalog import QUERIES, load_all
from tms_etl_spark.operators.packing import bin_summary, pack_sequences
from tms_etl_spark.operators.sampling import (
    mixture_sample,
    quantile_threshold_filter,
)
from tms_etl_spark.sources.tables import load_table

load_all()


def _md5_u32(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


def _doc_tokens(spark, sf_dir):
    return {
        r["doc_id"]: len(re.split(r"\s+", r["text"].strip()))
        for r in load_table(spark, sf_dir, "documents").collect()
    }


def test_pack_sequences_matches_python_nextfit(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    budget, n_shards = 128, 8
    # python replay of the rule
    shards: dict = {}
    for doc_id in sorted(toks):
        shards.setdefault(_md5_u32(doc_id) % n_shards, []).append(doc_id)
    expect = {}
    for shard, ids in shards.items():
        bin_id, run = 0, 0
        for d in ids:
            t = toks[d]
            if run > 0 and run + t > budget:
                bin_id, run = bin_id + 1, 0
            run += t
            expect[d] = (shard, bin_id)

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(d, budget=budget, n_shards=n_shards)
    got = {r["id"]: (r["shard"], r["bin_id"]) for r in packed.collect()}
    assert got == expect


def test_pack_sequences_bins_fit_budget_or_are_singletons(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    bins = bin_summary(pack_sequences(d, budget=128, n_shards=8)).collect()
    assert bins
    multi = [b for b in bins if b["n_docs"] > 1]
    assert multi  # non-vacuous: some bins actually pack
    for b in bins:
        assert b["bin_tokens"] <= 128 or b["n_docs"] == 1
        assert b["first_doc"] <= b["last_doc"]


def test_pack_sequences_single_exchange(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    plan = (
        pack_sequences(d, budget=128, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # only the shard shuffle


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    weights = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15}
    budget = 300
    counts = Counter(r["lang"] for r in d.select("lang").collect())
    out = mixture_sample(d, weights, budget).collect()
    assert len(out) == sum(counts.values())
    for r in out:
        rate = min(1.0, budget * weights[r["lang"]] / counts[r["lang"]])
        assert r["rate"] == rate
        assert r["sampled"] == (_md5_u32(r["doc_id"]) / 0xFFFFFFFF < rate)


def test_mixture_sample_clamps_and_unknown_class(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # huge budget → every rate clamps to 1.0 → everything sampled
    all_in = mixture_sample(d, {"en": 1.0}, budget=10**9).where("lang = 'en'")
    assert all_in.where(~F.col("sampled")).count() == 0
    assert all_in.where(F.col("rate") != 1.0).count() == 0
    # a class with no weight gets rate 0 → nothing sampled
    zero = mixture_sample(d, {"en": 1.0}, budget=10**9).where("lang = 'de'")
    assert zero.where(F.col("sampled")).count() == 0


def test_mixture_sample_broadcasts_rates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    plan = (
        mixture_sample(d, {"en": 0.5}, budget=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_quantile_threshold_filter_rule(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    rows = d.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_tokens"])
    cutoffs = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        # min value with cume_dist >= 0.25 (ties share cume_dist)
        cutoffs[lang] = min(
            v
            for i, v in enumerate(vals)
            if sum(1 for x in vals if x <= v) / n >= 0.25
        )
    out = quantile_threshold_filter(
        d, metric_col="n_tokens", group_col="lang", p=0.25
    ).collect()
    assert len(out) == len(rows)
    kept = sum(1 for r in out if r["kept"])
    assert 0 < kept < len(out)  # both sides of the cut non-empty
    for r in out:
        assert r["cutoff"] == cutoffs[r["lang"]]
        assert r["kept"] == (r["n_tokens"] >= r["cutoff"])


def test_contamination_check_excludes_eval_and_flags(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    grams = {}
    for d, t in docs.items():
        toks = re.split(r"\s+", t.strip().lower())
        if len(toks) >= 3:
            grams[d] = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    eval_grams = set().union(
        *(g for d, g in grams.items() if d % 97 == 0)
    )
    out = {r["doc_id"]: r for r in QUERIES["contamination_check"](
        spark, sf_dir
    ).collect()}
    assert set(out) == {d for d in grams if d % 97 != 0}
    assert any(r["contaminated"] for r in out.values())  # non-vacuous
    for d in list(out)[:50]:
        hits = sum(1 for g in grams[d] if g in eval_grams)
        assert out[d]["n_grams"] == len(grams[d])
        assert out[d]["n_eval_shared"] == hits
        assert out[d]["contaminated"] == (hits > 0)


def test_inverted_index_postings(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    posting: dict = {}
    for d, t in docs.items():
        for term in set(re.split(r"\s+", t.strip().lower())):
            posting.setdefault(term, set()).add(d)
    out = {r["term"]: r for r in QUERIES["inverted_index"](
        spark, sf_dir
    ).collect()}
    assert set(out) == set(posting)
    for term, ids in posting.items():
        assert out[term]["df"] == len(ids)
        expect = ",".join(str(i) for i in sorted(ids)[:20])
        assert out[term]["postings"] == expect
