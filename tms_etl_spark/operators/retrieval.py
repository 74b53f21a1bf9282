"""Keyword-retrieval operators: BM25-style scoring, TF-IDF cosine
similarity to a query document, and hashing-trick feature vectors.

These are the search/feature primitives of a corpus pipeline — the
read side of the inverted index (``operators/corpus.py:inverted_index``)
and the sparse counterpart to the dense ANN family
(``operators/similarity.py``). Reference analog: the reference's
keyword/status lookups over collected reports
(/root/reference/src/main_01.py:443-452) generalized to ranked
retrieval over a document corpus.

Exactness discipline (the catalog's cross-engine contract):

- no transcendentals — the classic ``ln``-based idf is replaced by
  the *linear* (unlogged) rarity ratio ``(N + 1) / df``; every other
  BM25 component (tf saturation, length normalization) is already
  rational. ``ln`` idf is a one-line swap for deployments that don't
  need bit-reproducibility across engines/libms.
- per-term scores are summed through DECIMAL so the per-document
  total is independent of term arrival order;
- ``sqrt`` IS used for cosine norms: IEEE-754 requires sqrt to be
  correctly rounded, so it is bit-deterministic cross-engine (unlike
  ``ln``/``exp``/``pow``).

Scale notes per operator are in the docstrings; nothing here joins
corpus-sized relations on anything but a bounded key (query terms,
token vocabulary after query filtering, doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term) rows plus the document length in tokens."""
    toks = F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("doc_len"),
        F.explode(toks).alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25-style
    scoring with a linear idf.

    score(d, Q) = Σ_{q∈Q} idf(q) · tf(q,d)·(k1+1) /
                          (tf(q,d) + k1·(1 − b + b·|d|/avgdl))
    with idf(q) = (N + 1) / df(q)  (unlogged; see module docstring).

    Plan shape / 100 TB posture: one corpus tokenize+explode pass;
    tf is a (doc, term) partial-aggregating groupBy *after* filtering
    to the query's terms, so the exchange moves only rows whose term
    is in Q (|Q| terms — the inverted-index access path); df and
    avgdl are term-/scalar-sized aggregates joined back as
    broadcasts; the final ranking is TakeOrdered(k), never a global
    sort. Nothing shuffles the corpus on an unbounded key.
    """
    q = F.array(*[F.lit(t) for t in query_terms])
    toks = _doc_tokens(docs, text_col, id_col)

    # Corpus statistics: N and avgdl. Computed straight off the docs
    # relation (one scalar aggregate, no explode, no doc-key
    # exchange) — ids are unique, so this equals the tokens-side
    # per-doc rollup the oracle spells out.
    dl = F.size(F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)).cast("long")
    stats = (
        docs.select(dl.alias("doc_len"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("doc_len").cast("decimal(18,0)"))
            .cast("double")
            .alias("tok_total"),
        )
        .select(
            "n_docs", (F.col("tok_total") / F.col("n_docs")).alias("avgdl")
        )
    )

    qtoks = toks.where(F.array_contains(q, F.col("term")))
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"),
        F.first("doc_len").alias("doc_len"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", (F.col("n_docs") + F.lit(1.0)) / F.col("df")
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("doc_len") / F.col("avgdl")
                )
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("term_score").cast("decimal(28,8)")), 6)
            .cast("double")
            .alias("score"),
            F.count("*").cast("long").alias("terms_hit"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    query_doc_id: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by TF-IDF-weighted cosine similarity to
    one query document — the sparse-vector twin of
    ``similarity.cosine_topk`` (dense embeddings).

    Weight w(d, t) = tf(d, t) · (N + 1)/df(t) (linear idf, see
    module docstring); cosine = dot / (‖a‖·‖b‖) with decimal-exact
    dot/norm sums and the IEEE-deterministic sqrt.

    Plan shape: tf and df are corpus aggregations on (doc, term) /
    term keys (both partial-aggregate map-side); the query's weight
    vector is one document's terms — joined as a broadcast, so
    scoring every corpus document is a map-side hash join plus ONE
    doc-keyed aggregation. No corpus×corpus join anywhere; the
    all-pairs variant belongs to the LSH/df-cut candidate family
    (``operators/dedup.py``).
    """
    toks = _doc_tokens(docs, text_col, id_col)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_row = tf.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))

    w = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_row))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * ((F.col("n_docs") + F.lit(1.0)) / F.col("df"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.round(
                F.sum((F.col("w") * F.col("w")).cast("decimal(28,8)")), 6
            ).cast("double")
        ).alias("norm")
    )
    qw = w.where(F.col("doc_id") == query_doc_id).select(
        F.col("term"), F.col("w").alias("qw")
    )
    qnorm = norms.where(F.col("doc_id") == query_doc_id).select(
        F.col("norm").alias("qnorm")
    )
    dots = (
        w.where(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum((F.col("w") * F.col("qw")).cast("decimal(28,8)")), 6
            )
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            (F.col("dot") / (F.col("norm") * F.col("qnorm"))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(k)
    )


def hash_features(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick sparse features (Weinberger et al. 2009): each
    token maps to ``bucket = h(token) mod n_buckets`` with a sign bit
    from an independent hash bit, and per-(doc, bucket) signed counts
    form a fixed-width feature vector no vocabulary table can bloat.

    Engine-portable hash: the first 8 hex chars of ``md5(token)``
    read as an integer (the repo's standard md5-uniform primitive —
    ``operators/sampling.py``), sign from the 9th hex digit's low
    bit. Both are pure string/bit built-ins in Spark and DuckDB.

    Plan shape: tokenize + hash are map-side; ONE partial-aggregating
    exchange on (doc, bucket) — at most ``n_buckets`` output rows per
    document regardless of vocabulary, which is the operator's whole
    point at 100 TB (feature width is a constant, not a vocab scan).
    """
    toks = _doc_tokens(docs, text_col, id_col)
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    sign_digit = F.conv(
        F.substring(F.md5(F.col("term")), 9, 1), 16, 10
    ).cast("long")
    sign = F.when(sign_digit % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.select(
            "doc_id",
            (h % n_buckets).alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sign").cast("long").alias("feature"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


__all__ = ["bm25_topk", "tfidf_cosine_topk", "hash_features"]
