"""Byte-pair-encoding vocabulary training — the real iterative merge
loop (Sennrich et al. 2016, arXiv 1508.07909), Spark-first.

The classic algorithm: represent each word as a symbol sequence
(initially characters), repeatedly find the most frequent adjacent
symbol pair across the corpus and merge it into one symbol. The key
scale observation (same as the original implementation): training
operates on the WORD-TYPE table weighted by word counts — vocabulary-
bounded, orders of magnitude smaller than the corpus — so after ONE
corpus-sized aggregation every merge round is a small job over the
type table:

    round:  explode adjacent pairs (weighted by word count)
            -> partial-aggregated pair counts -> TakeOrdered(1)
            -> merge fold rewrites each word's symbol array map-side

The merge fold is a JVM `F.aggregate` (left-to-right, non-
overlapping — the standard BPE convention), so no Python touches the
data path; the driver holds only the learned merge list (k rows of
index metadata). Ties break deterministically on the pair's
lexicographic order, making the learned vocabulary reproducible on
any engine and any partitioning.

Reference analog: the engine's subword_vocab_topk
(`operators/corpus.py`) surfaces merge CANDIDATES; this module runs
the actual dependent-merge iteration that candidates can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tms_etl_spark.operators.checkpoints import unpersist_checkpoint
from tms_etl_spark.operators.corpus import TOKEN_SPLIT


def word_type_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) weighted word-type table — the one corpus-sized
    reduction in BPE training. Words lowercased, whitespace-split."""
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    return (
        df.select(F.explode(toks).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(types: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
    )
    return (
        types.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_expr(a: str, b: str) -> F.Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) in
    ``syms`` — a JVM aggregate fold: push each symbol; when the
    accumulator ends with `a` and the incoming symbol is `b`, replace
    the tail with the merged symbol instead."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    return F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (s == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_lit, b_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(left, right, weighted
    count), ...] in merge order. Driver holds only this k-row merge
    list; every per-round job runs on the cached vocabulary-bounded
    type table. Rounds with no remaining pair stop early."""
    types = word_type_table(df, text_col).select(
        F.expr("filter(split(word, ''), s -> s != '')").alias("syms"),
        "n",
    )
    types = types.localCheckpoint()
    pin = types  # current checkpoint; superseded pins are released
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(types)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        types = types.select(_merge_expr(a, b).alias("syms"), "n")
        # checkpoint periodically: the merge folds otherwise stack
        # into one ever-deeper expression tree
        if (i + 1) % 8 == 0:
            types = types.localCheckpoint()
            unpersist_checkpoint(pin)  # superseded by the new pin
            pin = types
    unpersist_checkpoint(pin)  # merges list is driver-side: all dead
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list and count BPE
    tokens per document.

    The merges are applied in training order (standard greedy
    application) to the WORD-TYPE table, not to the corpus: each
    distinct word is segmented once, then documents join the
    (word -> n_syms) vocabulary — broadcast-sized — to sum their
    token counts. This matters twice at scale: the k chained merge
    folds run over the vocabulary-bounded type table (periodically
    localCheckpoint'ed so a realistic 8k-50k merge list can't stack
    into one unanalyzable expression tree — checkpointing the TYPE
    table is cheap; checkpointing the corpus per chunk would not
    be), and the corpus itself is touched by exactly one tokenize +
    broadcast-join pass."""
    vocab = word_type_table(df, text_col).select(
        "word",
        F.expr("filter(split(word, ''), s -> s != '')").alias("syms"),
    )
    pin = None  # superseded checkpoints only — the LAST one feeds
    # the returned plan and must stay resident
    for i, (a, b, _) in enumerate(merges):
        vocab = vocab.select("word", _merge_expr(a, b).alias("syms"))
        if (i + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
            unpersist_checkpoint(pin)
            pin = vocab
    seg = vocab.select("word", F.size("syms").alias("__n_syms"))

    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    words = df.select(
        F.col(id_col), F.explode(toks).alias("word")
    ).where(F.col("word") != "")
    joined = words.join(F.broadcast(seg), "word")
    return joined.groupBy(id_col).agg(
        F.sum("__n_syms").cast("long").alias("n_bpe_tokens"),
        F.count("*").cast("long").alias("n_words"),
    )
