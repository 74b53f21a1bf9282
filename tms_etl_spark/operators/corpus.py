"""Corpus-level statistics operators: per-document salient terms
(TF-DF weighting) and cross-document exact n-gram sharing (the
"exact substring dedup" of training-data pipelines, cf. Lee et al.
2021, arXiv:2107.06499 — re-expressed relationally: shared windows
are found by grouping on the n-gram itself, never by comparing
document pairs).

Scale shape (the part that matters at 100 TB):

- tokenization/explode is map-side;
- term statistics (document frequency) aggregate map-side first and
  produce a VOCABULARY-sized table — orders of magnitude smaller than
  the corpus — which is then broadcast back onto the token stream, so
  the big side is never reshuffled for the join;
- n-gram sharing shuffles on the n-gram key once; hot boilerplate
  n-grams can be cut with ``max_df`` exactly like the Jaccard
  token-join (`operators/dedup.py`), bounding the worst group.

No Python in any hot path — everything below is built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    return df.select(
        id_col,
        F.size(toks).cast("long").alias("doc_len"),
        F.explode(toks).alias("term"),
    )


def salient_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` most characteristic terms per document, ranked by
    (tf DESC, df ASC, term ASC) — frequent in the document, rare in
    the corpus — plus a tf-idf-style score.

    The ranking key is pure integers + the term itself, so the
    selected set is exactly reproducible on any engine/partitioning;
    the ``score`` double is two IEEE divisions and one multiply in a
    fixed order, which both Spark and DuckDB round identically.

    Plan: one shuffle to (doc, term) grain for tf, one map-side-
    combined aggregation of that to the vocabulary grain for df
    (broadcast back — vocab ≪ corpus), one window on the doc for the
    top-k. ``N`` (corpus size) rides along as a broadcast 1-row agg,
    never a driver-side collect.
    """
    tf = (
        _tokens(df, text_col, id_col)
        .groupBy(id_col, "doc_len", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # document frequency: tf is unique per (doc, term), so df is a
    # plain count — map-side combinable, output is vocab-sized
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = df.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf").cast("double") / F.col("doc_len"))
            * (F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "term", "tf", "df", "score")
    )


def contamination_stats(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination profile: for every training document,
    how many of its distinct word ``n``-grams also occur in the eval
    set, and whether any do (``contaminated``). This is the
    decontamination step of a training-data pipeline (drop or flag
    training docs that leak evaluation data).

    Plan: the eval side reduces to a DISTINCT n-gram set — benchmark-
    sized, not corpus-sized — and is BROADCAST onto the exploded
    training grams; the training side is map-only until its one
    per-doc aggregation. At 100 TB of training data and a few MB of
    benchmarks this is the only shape that works: the corpus never
    shuffles on the gram key.
    """
    tg = _doc_ngrams(train, n, text_col, id_col)
    eg = (
        _doc_ngrams(eval_set, n, text_col, id_col)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = tg.join(F.broadcast(eg), "gram", "left")
    n_hits = F.sum(
        F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
    ).cast("long")
    n_grams = F.count("*").cast("long")
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_hits.alias("n_eval_shared"),
        (n_hits / n_grams).alias("eval_frac"),
        (n_hits > 0).alias("contaminated"),
    )


def inverted_index(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Term → posting-list index: per term, its document frequency
    and the first ``k`` doc ids (numerically sorted, serialized as a
    comma-joined string so the result is engine-comparable). The
    search-side primitive for keyword retrieval over a corpus.

    Plan: distinct (doc, term) then ONE aggregation on the term key;
    collect_list is bounded per group by the vocabulary's df and the
    output is vocabulary-sized. For web-scale vocabularies the
    hot-term bound is the same ``max_df`` cut as the Jaccard join.
    """
    toks = (
        _tokens(df, text_col, id_col)
        .select(F.col(id_col).cast("long").alias("__doc"), "term")
        .distinct()
    )
    postings = F.slice(F.sort_array(F.collect_list("__doc")), 1, k)
    return toks.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.array_join(
            F.transform(postings, lambda x: x.cast("string")), ","
        ).alias("postings"),
    )


def ngram_lm_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """N-gram language-model count tables — the sufficient statistics
    of Kneser-Ney / Stupid-Backoff estimation over a corpus: for every
    word ``n``-gram (context = first n-1 tokens, word = last), its
    corpus count, the context's total count, and the word's
    continuation count (distinct contexts it follows — the KN
    numerator). All counts are exact longs, so the table is engine-
    comparable bit-for-bit.

    Plan: one explode to n-gram grain (map-side), ONE shuffle to the
    (context, word) type grain; the two marginals are map-side-
    combined aggregations OF THE TYPE TABLE (n-gram-type-sized, not
    corpus-sized) joined back on their keys. At 100 TB the corpus is
    touched once; everything after operates on the vocabulary-bounded
    type table.
    """
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    gram_struct = (
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> struct(array_join(slice(__toks, i, {n - 1}), ' ') AS context, "
        f"element_at(__toks, i + {n - 1}) AS word))"
    )
    grams = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") >= n)
        .select(F.explode(F.expr(gram_struct)).alias("g"))
        .select("g.context", "g.word")
    )
    pair = grams.groupBy("context", "word").agg(
        F.count("*").cast("long").alias("ngram_count")
    )
    ctx = pair.groupBy("context").agg(
        F.sum("ngram_count").cast("long").alias("context_count")
    )
    cont = pair.groupBy("word").agg(
        F.count("*").cast("long").alias("continuation_count")
    )
    return pair.join(ctx, "context").join(cont, "word").select(
        "context", "word", "ngram_count", "context_count", "continuation_count"
    )


def subword_vocab_topk(
    df: DataFrame,
    k: int = 100,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Subword vocabulary candidates: the ``k`` most frequent
    character ``n``-grams over the corpus's words (a word shorter
    than ``n`` characters contributes itself whole — the BPE
    convention that short words are atomic tokens). Returns
    (vocab_rank, gram, cnt) with the deterministic tie-break
    (cnt DESC, gram ASC), so the selected set is reproducible on any
    engine or partitioning.

    Plan: explode words (map-side), explode char-grams (map-side,
    bounded per word by its length), ONE map-side-combined count on
    the gram key to a vocabulary-sized table, then TakeOrdered for
    the top-k — no global sort of the corpus, and the final
    row_number window runs over k rows only.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)).alias("w")
    ).where(F.col("w") != "")
    # sequence(1, greatest(length-n+1, 1)) degenerates to [1] for
    # short words, and substring(w, 1, n) of a short word IS the word
    grams = words.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(w) - {n - 1}, 1)), "
                f"i -> substring(w, i, {n}))"
            )
        ).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").cast("long").alias("cnt"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("gram").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return topk.withColumn(
        "vocab_rank", F.row_number().over(w).cast("int")
    ).select("vocab_rank", "gram", "cnt")


def _doc_ngrams(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Distinct (id, word-n-gram) pairs; docs shorter than ``n``
    tokens contribute nothing."""
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    grams_expr = F.expr(
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> array_join(slice(__toks, i, {n}), ' '))"
    )
    return (
        df.select(id_col, toks.alias("__toks"))
        .where(F.size("__toks") >= n)
        .select(id_col, F.explode(grams_expr).alias("gram"))
        .distinct()
    )


def shared_ngram_stats(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document overlap profile against the whole corpus: how many
    of the document's distinct word ``n``-grams also appear in at
    least ``min_docs - 1`` OTHER documents, and the fraction of the
    document that overlap represents.

    This is the relational form of exact-substring dedup (Lee et al.
    2021): instead of a suffix array, every n-token window becomes a
    key and sharing is one aggregation on that key. ``max_df`` drops
    n-grams appearing in more documents than the cut (boilerplate —
    same hot-key bound as the Jaccard token join).

    Plan: explode to (doc, gram) distinct (one shuffle), aggregate
    grams to their doc-counts (map-side combined, reuses the same
    hash), left-join the per-doc grain back on the gram key (one
    shuffle on gram — the join is gram-keyed, never doc-pair-keyed),
    then one aggregation per doc.
    """
    doc_grams = _doc_ngrams(df, n, text_col, id_col)
    counts = doc_grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("gram_docs")
    )
    if max_df is not None:
        counts = counts.where(F.col("gram_docs") <= max_df)
    joined = doc_grams.join(counts, "gram", "left")
    n_shared = F.sum(
        F.when(F.col("gram_docs") >= min_docs, 1).otherwise(0)
    ).cast("long")
    n_grams = F.count("*").cast("long")
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_shared.alias("n_shared"),
        (n_shared / n_grams).alias("shared_frac"),
        (n_shared > 0).alias("has_shared"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 64,
) -> DataFrame:
    """Basket co-occurrence support counts: for every unordered item
    pair sharing a basket, the number of baskets containing both —
    the candidate-generation step of frequent-itemset / association
    mining.

    Degenerate-basket bound (same discipline as the LSH hot-bucket
    star cap in ``dedup.minhash_lsh_pairs``): a pathological basket
    with B items would emit C(B,2) pairs — quadratic. Baskets larger
    than ``max_basket`` are capped to a deterministic pseudo-random
    ``max_basket``-item sample (xxhash64 rank, so the choice is
    stable across runs and partitionings), bounding per-basket pairs
    at C(max_basket, 2) while leaving every normal basket exact.
    Counts for capped baskets are a documented undercount — the knob
    trades tail-basket recall for a hard cost ceiling.

    Shape: the rank window, the self-join, and the final agg's input
    all key on the basket — one partitioning reused; pair counts
    partial-aggregate map-side.
    """
    b = df.select(basket_col, item_col).distinct()
    w = Window.partitionBy(basket_col).orderBy(
        F.xxhash64(F.col(basket_col), F.col(item_col)), F.col(item_col)
    )
    capped = (
        b.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_basket)
        .drop("__rk")
    )
    a = capped.select(basket_col, F.col(item_col).alias("item_a"))
    c = capped.select(basket_col, F.col(item_col).alias("item_b"))
    return (
        a.join(c, basket_col)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_baskets"))
    )
