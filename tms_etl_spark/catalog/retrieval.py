"""Retrieval / sparse-feature catalog entries: BM25-style keyword
ranking, TF-IDF cosine to a query document, and hashing-trick
features — the sparse-text counterpart of the dense ANN family.

Exactness: linear (unlogged) idf keeps the scoring free of
transcendentals (``ln`` is libm-dependent and deliberately excluded
from the oracle contract — see ``catalog/__init__`` conventions);
cosine uses ``sqrt``, which IEEE-754 requires to be correctly
rounded, so it is bit-deterministic cross-engine. SQL oracles repeat
the Spark side's exact parse trees (``(1.2 + 1.0)``, not ``2.2``) so
literal-parsing differences can never surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.retrieval import (
    bm25_topk,
    hash_features,
    tfidf_cosine_topk,
)
from tms_etl_spark.sources.tables import load_table

_TOKS = (
    "SELECT doc_id,"
    " len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS doc_len,"
    " unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term"
    " FROM documents"
)

_QTERMS = ("spark", "vector", "merge")


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    dl AS (
        SELECT doc_id, any_value(doc_len) AS doc_len
        FROM toks GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(doc_len AS DECIMAL(18,0))) AS DOUBLE)
                 / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
               any_value(doc_len) AS doc_len
        FROM toks WHERE term IN {_QTERMS!r}
        GROUP BY doc_id, term
    ),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           -- every literal CAST to DOUBLE: a bare 1.2 is DECIMAL in
           -- DuckDB and decimal×bigint is computed exactly, which
           -- drifts an ulp from Spark's double multiply
           CAST(ROUND(SUM(CAST(
               ((CAST(s.n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE))
                / dft.df)
               * (tf.tf * CAST(2.2 AS DOUBLE))
               / (tf.tf + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE)
                               * tf.doc_len / s.avgdl))
             AS DECIMAL(28,8))), 6) AS DOUBLE) AS score,
           CAST(COUNT(*) AS BIGINT) AS terms_hit
    FROM tf JOIN dft USING (term) CROSS JOIN stats s
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id ASC
    LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked keyword retrieval (k1=1.2, b=0.75, linear idf)
    for a 3-term query over the documents corpus. Plan: the corpus
    shuffles once on (doc, term) AFTER the query-term filter (the
    inverted-index access path); df/avgdl are broadcast-sized;
    ranking is TakeOrdered(10). See
    ``operators/retrieval.py:bm25_topk``."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, list(_QTERMS), k=10)


@query(
    "text_tfidf_cosine_topk",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    nrow AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    w AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ((n.n_docs + 1.0) / dft.df) AS w
        FROM tf JOIN dft USING (term) CROSS JOIN nrow n
    ),
    norms AS (
        SELECT doc_id,
               sqrt(CAST(ROUND(SUM(CAST(w * w AS DECIMAL(28,8))), 6)
                         AS DOUBLE)) AS norm
        FROM w GROUP BY doc_id
    ),
    qw AS (SELECT term, w AS qw FROM w WHERE doc_id = 0),
    qnorm AS (SELECT norm AS qnorm FROM norms WHERE doc_id = 0),
    dots AS (
        SELECT w.doc_id,
               CAST(ROUND(SUM(CAST(w.w * qw.qw AS DECIMAL(28,8))), 6)
                    AS DOUBLE) AS dot
        FROM w JOIN qw USING (term)
        WHERE w.doc_id <> 0
        GROUP BY w.doc_id
    )
    SELECT d.doc_id, d.dot / (n.norm * q.qnorm) AS cosine
    FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qnorm q
    ORDER BY cosine DESC, d.doc_id ASC
    LIMIT 10
    """,
)
def text_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine retrieval: the 10 documents most similar
    to doc 0. Query weights broadcast; ONE doc-keyed aggregation
    scores the whole corpus — no corpus×corpus join. See
    ``operators/retrieval.py:tfidf_cosine_topk``."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_topk(docs, query_doc_id=0, k=10)


@query(
    "feature_hashing",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    hashed AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % 64
                 AS bucket,
               CASE WHEN CAST(('0x' || substring(md5(term), 9, 1))
                         AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS sign
        FROM toks
    )
    SELECT doc_id, bucket,
           CAST(SUM(sign) AS BIGINT) AS feature,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM hashed
    GROUP BY doc_id, bucket
    """,
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick signed feature counts (64 buckets): map-side
    md5 bucket+sign, ONE partial-aggregating (doc, bucket) exchange
    — feature width is constant regardless of vocabulary. See
    ``operators/retrieval.py:hash_features``."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_features(docs, n_buckets=64)
