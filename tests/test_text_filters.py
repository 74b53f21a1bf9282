"""Corpus-filter entries (catalog/text_filters.py): Gopher quality
gate, 2-gram repetition score, PII redaction, token-window chunking.
Each is checked against a plain-Python recomputation on sample docs
(the cross-engine hash match is the driver gate's job)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import functions as F

from tms_etl_spark.catalog import QUERIES, load_all
from tms_etl_spark.sources.tables import load_table

load_all()


def _docs(spark, sf_dir, n=30):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(n).collect()
    }


def test_gopher_quality_matches_python(spark, sf_dir):
    texts = _docs(spark, sf_dir)
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_gopher_quality"](spark, sf_dir)
        .where(F.col("doc_id").isin(list(texts)))
        .collect()
    }
    assert set(rows) == set(texts)
    for doc_id, text in texts.items():
        words = re.split(r"\s+", text.strip())
        n_words = len(words)
        n_chars = len(re.sub(r"\s", "", text))
        n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
        r = rows[doc_id]
        assert r["n_words"] == n_words
        assert abs(r["mean_word_len"] - n_chars / n_words) < 1e-12
        assert abs(r["alpha_word_frac"] - n_alpha / n_words) < 1e-12
        expect_pass = (
            10 <= n_words <= 100000
            and 2.0 <= n_chars / n_words <= 12.0
            and r["symbol_ratio"] <= 0.1
            and n_alpha / n_words >= 0.7
        )
        assert r["passes_gopher"] == expect_pass


def test_repetition_filter_matches_python(spark, sf_dir):
    texts = _docs(spark, sf_dir)
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_repetition_filter"](spark, sf_dir)
        .where(F.col("doc_id").isin(list(texts)))
        .collect()
    }
    for doc_id, text in texts.items():
        toks = re.split(r"\s+", text.strip().lower())
        if len(toks) < 2:
            assert doc_id not in rows
            continue
        grams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        r = rows[doc_id]
        assert r["n_grams"] == sum(grams.values())
        assert r["top_gram_count"] == max(grams.values())
        assert r["repetitive"] == (
            max(grams.values()) / sum(grams.values()) > 0.18
        )


def test_pii_redact_matches_python_and_is_nonvacuous(spark, sf_dir):
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    num_re = r"\d{4,}"
    texts = _docs(spark, sf_dir, n=50)
    rows = {
        r["doc_id"]: r
        for r in QUERIES["text_pii_redact"](spark, sf_dir)
        .where(F.col("doc_id").isin(list(texts)))
        .collect()
    }
    redactions = 0
    for doc_id, text in texts.items():
        # the catalog entry appends deterministic PII (the raw corpus
        # has none) — mirror it here
        text = f"{text} contact user{doc_id}@example.com ref {doc_id * 7919}"
        r = rows[doc_id]
        assert r["n_emails"] == len(re.findall(email_re, text))
        assert r["n_long_numbers"] == len(re.findall(num_re, text))
        redacted = re.sub(num_re, "<NUM>", re.sub(email_re, "<EMAIL>", text))
        assert r["redacted_fp"] == hashlib.md5(redacted.encode()).hexdigest()
        redactions += r["n_emails"] + r["n_long_numbers"]
    # a redaction pass that never redacts is a vacuous check
    assert redactions > 0


def test_chunk_tokens_tiles_documents(spark, sf_dir):
    """Chunks stride by 48 with 16-token overlap, never exceed the
    doc's token count, and the last chunk reaches it exactly."""
    out = QUERIES["text_chunk_tokens"](spark, sf_dir).collect()
    n_tok = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["text_token_count"](spark, sf_dir).collect()
    }
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc_id, chunks in list(by_doc.items())[:200]:
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = n_tok[doc_id]
        assert chunks[0]["token_start"] == 0
        for c in chunks:
            assert c["token_start"] == c["chunk_idx"] * 48
            assert c["token_end"] <= n
        assert max(c["token_end"] for c in chunks) == min(
            max(n, 0), chunks[-1]["token_end"]
        )
        assert chunks[-1]["token_end"] == n or n < 1
