"""BPE trainer: exact equality with a pure-python reference replay
(the Sennrich algorithm on the same word-count table), determinism,
and greedy application consistency."""

from __future__ import annotations

import re
from collections import Counter

from tms_etl_spark.operators.bpe import (
    apply_bpe,
    learn_bpe_merges,
    word_type_table,
)


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference implementation: weighted pair counts over word
    types, top pair by (count DESC, pair ASC), left-to-right
    non-overlapping merge."""
    types = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, n in types.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        new_types: dict[tuple, int] = {}
        for syms, n in types.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_types[key] = new_types.get(key, 0) + n
        types = new_types
    return merges


def _corpus(spark):
    docs = [
        (1, "the lower the newer the lowest"),
        (2, "low lower lowest newest new"),
        (3, "wider wide widest new newer"),
        (4, "the low wide new"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_merges_match_python_replay(spark):
    df = _corpus(spark)
    got = learn_bpe_merges(df, n_merges=12)
    wc = {
        r["word"]: r["n"] for r in word_type_table(df).collect()
    }
    expect = _python_bpe(wc, 12)
    assert got == expect
    assert len(got) == 12
    # the corpus's dominant pattern surfaces early: some merge builds
    # toward 'low'/'ne(w)' clusters
    merged_symbols = {a + b for a, b, _ in got}
    assert any(s in merged_symbols for s in ("lo", "ne", "th", "we"))


def test_training_is_deterministic(spark):
    df = _corpus(spark)
    assert learn_bpe_merges(df, 8) == learn_bpe_merges(df, 8)


def test_apply_counts_are_consistent(spark):
    """After k merges, every document's BPE token count is between
    its word count (full merges) and its character count (none)."""
    df = _corpus(spark)
    merges = learn_bpe_merges(df, 10)
    out = {r["doc_id"]: r for r in apply_bpe(df, merges).collect()}
    for doc_id, text in [(r[0], r[1]) for r in _corpus(spark).collect()]:
        words = [w for w in re.split(r"\s+", text.lower().strip()) if w]
        n_chars = sum(len(w) for w in words)
        row = out[doc_id]
        assert row["n_words"] == len(words)
        assert len(words) <= row["n_bpe_tokens"] <= n_chars
    # merges actually compress: strictly fewer tokens than characters
    assert all(
        out[d]["n_bpe_tokens"]
        < sum(len(w) for w in re.split(r"\s+", t.lower()) if w)
        for d, t in [(r[0], r[1]) for r in _corpus(spark).collect()]
    )


def test_early_stop_on_exhausted_pairs(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = learn_bpe_merges(df, 50)
    # 'a b' is the only pair; after merging it nothing remains
    assert merges == [("a", "b", 2)]
