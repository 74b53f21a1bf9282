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
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import decimal_dot
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


_FUSE_N = 20  # candidate depth per ranker
_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@query(
    "retrieval_rrf_fusion",
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
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    bm AS (
        SELECT tf.doc_id,
               CAST(ROUND(SUM(CAST(
                   ((CAST(s.n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE))
                    / dft.df)
                   * (tf.tf * CAST(2.2 AS DOUBLE))
                   / (tf.tf + CAST(1.2 AS DOUBLE)
                              * (CAST(0.25 AS DOUBLE)
                                 + CAST(0.75 AS DOUBLE)
                                   * tf.doc_len / s.avgdl))
                 AS DECIMAL(28,8))), 6) AS DOUBLE) AS score
        FROM tf JOIN dft USING (term) CROSS JOIN stats s
        GROUP BY tf.doc_id
    ),
    bmr AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS r
        FROM bm QUALIFY r <= {_FUSE_N}
    ),
    q AS (
        SELECT generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    v AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS vv
        FROM embeddings WHERE vec_id <> 0
    ),
    sums AS (
        SELECT v.vec_id,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(v.vv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nv,
               CAST(ROUND(SUM(CAST(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nq
        FROM v JOIN q USING (i) GROUP BY v.vec_id
    ),
    cosr AS (
        SELECT vec_id,
               CAST(row_number() OVER (
                   ORDER BY dot / (sqrt(nq) * sqrt(nv)) DESC, vec_id
               ) AS BIGINT) AS r
        FROM sums QUALIFY r <= {_FUSE_N}
    )
    SELECT COALESCE(bmr.doc_id, cosr.vec_id) AS doc_id,
           COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + bmr.r),
                    CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + cosr.r),
                      CAST(0.0 AS DOUBLE)) AS rrf_score,
           bmr.r AS bm25_rank,
           cosr.r AS cosine_rank
    FROM bmr FULL JOIN cosr ON bmr.doc_id = cosr.vec_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    of the BM25 keyword ranking and the exact embedding-cosine
    ranking for the paired query (terms + vector of doc/vec 0) —
    rrf = sum over rankers of 1/(60 + rank) on the candidate union.

    Exactness: RRF consumes only the RANKS (integers, both rankings
    deterministically tie-broken), so the fused score is a fixed
    two-term expression of exact integer divisions — engine-portable
    where score-level fusion of floats would not be. Scale: each
    ranker already bounds its own cost (query-term-filtered exchange
    for BM25; per-query scoring for cosine, bucketed at scale via
    the LSH/IVF paths); fusion joins two k-row lists — driver-scale
    metadata, whatever the corpus size."""
    from pyspark.sql import Window

    from tms_etl_spark.catalog.similarity import _exact_rerank

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    bm = bm25_topk(docs, list(_QTERMS), k=_FUSE_N)
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bmr = bm.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("r_bm")
    )

    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow["embedding"]]
    exact = _exact_rerank(emb.where(F.col("vec_id") != 0), qv, _FUSE_N)
    wc = Window.orderBy(F.desc("cos_exact"), F.asc("vec_id"))
    cosr = exact.select(
        "vec_id", F.row_number().over(wc).cast("long").alias("r_cos")
    )

    fused = bmr.join(cosr, bmr["doc_id"] == cosr["vec_id"], "full_outer")
    one = F.lit(1.0)
    rrf = F.coalesce(one / (_RRF_K + F.col("r_bm")), F.lit(0.0)) + F.coalesce(
        one / (_RRF_K + F.col("r_cos")), F.lit(0.0)
    )
    return (
        fused.select(
            F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
            rrf.alias("rrf_score"),
            F.col("r_bm").alias("bm25_rank"),
            F.col("r_cos").alias("cosine_rank"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


_MRR_QUERIES = 5  # evaluation query set: vec_ids 0..4


@query(
    "eval_retrieval_rank",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, label AS qlabel,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS qv
        FROM embeddings WHERE vec_id < {_MRR_QUERIES}
    ),
    v AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS vv
        FROM embeddings
    ),
    sums AS (
        SELECT q.qid, q.qlabel, v.vec_id, any_value(v.label) AS label,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(v.vv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nv,
               CAST(ROUND(SUM(CAST(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nq
        FROM v JOIN q USING (i)
        WHERE v.vec_id <> q.qid
        GROUP BY q.qid, q.qlabel, v.vec_id
    ),
    ranked AS (
        SELECT qid, qlabel, vec_id, label,
               CAST(row_number() OVER (
                   PARTITION BY qid
                   ORDER BY dot / (sqrt(nq) * sqrt(nv)) DESC, vec_id
               ) AS BIGINT) AS r
        FROM sums
    )
    SELECT qid AS query_id,
           CAST(MIN(CASE WHEN label = qlabel THEN r END) AS BIGINT)
             AS first_relevant_rank,
           CAST(1.0 AS DOUBLE)
             / MIN(CASE WHEN label = qlabel THEN r END)
             AS reciprocal_rank
    FROM ranked GROUP BY qid
    """,
)
def eval_retrieval_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-based retrieval evaluation: for each of the 5 query
    vectors, the rank of the first SAME-LABEL neighbor in the exact
    cosine ranking (excluding self) and its reciprocal — the
    per-query rows of MRR. Rank-free formulation: the rank of the
    first relevant hit equals 1 + COUNT(docs ordering strictly before
    the best relevant doc), so no per-qid ranking of the full corpus
    is ever materialized — a `Window.partitionBy(qid)` here would put
    every scored corpus row for a query through ONE task. Instead the
    best relevant doc per query is a max-by aggregation (partial,
    map-side combining), broadcast back, and the count is a plain
    groupBy. Ordering comparisons use the same deterministic
    (cos DESC, vec_id ASC) tiebreak as the oracle's window, on the
    same rounded-decimal cosines, so ranks are engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") < _MRR_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.posexplode("embedding").alias("i", "qv"),
        )
    )
    v = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "vv")
    )
    dd = decimal_dot
    sums = (
        v.join(F.broadcast(q), "i")
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "qlabel", "vec_id")
        .agg(
            F.any_value("label").alias("label"),
            F.round(F.sum(dd(F.col("vv"), F.col("qv"))), 8)
            .cast("double")
            .alias("dot"),
            F.round(F.sum(dd(F.col("vv"), F.col("vv"))), 8)
            .cast("double")
            .alias("nv"),
            F.round(F.sum(dd(F.col("qv"), F.col("qv"))), 8)
            .cast("double")
            .alias("nq"),
        )
    )
    cos = F.col("dot") / (F.sqrt("nv") * F.sqrt("nq"))
    scored = sums.select(
        "qid", "qlabel", "label", "vec_id", cos.alias("c")
    )
    # best relevant doc per query under (c DESC, vec_id ASC): a
    # lexicographic struct-max — partial aggregation, no window
    best = (
        scored.where(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(
            F.max(
                F.struct(F.col("c"), (-F.col("vec_id")).alias("negid"))
            ).alias("__b")
        )
        .select(
            "qid",
            F.col("__b.c").alias("__bc"),
            (-F.col("__b.negid")).alias("__bvid"),
        )
    )
    joined = scored.join(F.broadcast(best), "qid", "left")
    before = (F.col("c") > F.col("__bc")) | (
        (F.col("c") == F.col("__bc")) & (F.col("vec_id") < F.col("__bvid"))
    )
    rank = F.when(
        F.count("__bc") > 0,
        F.lit(1) + F.sum(F.when(before, 1).otherwise(0)),
    )
    return joined.groupBy(F.col("qid").alias("query_id")).agg(
        rank.cast("long").alias("first_relevant_rank"),
        (F.lit(1.0) / rank).cast("double").alias("reciprocal_rank"),
    )


_NDCG_K = 10


@query(
    "eval_ndcg",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, label AS qlabel,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS qv
        FROM embeddings WHERE vec_id < {_MRR_QUERIES}
    ),
    v AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS vv
        FROM embeddings
    ),
    sums AS (
        SELECT q.qid, q.qlabel, v.vec_id, any_value(v.label) AS label,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(v.vv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nv,
               CAST(ROUND(SUM(CAST(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nq
        FROM v JOIN q USING (i)
        WHERE v.vec_id <> q.qid
        GROUP BY q.qid, q.qlabel, v.vec_id
    ),
    scored AS (
        SELECT qid, qlabel, vec_id, label,
               dot / (sqrt(nv) * sqrt(nq)) AS c
        FROM sums
    ),
    nrel AS (
        SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM scored WHERE label = qlabel GROUP BY qid
    ),
    top AS (
        SELECT qid, qlabel, label,
               CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY c DESC, vec_id DESC
               ) AS BIGINT) AS rn
        FROM scored
        QUALIFY rn <= {_NDCG_K}
    ),
    dcg AS (
        SELECT qid,
               CAST(SUM(CAST(
                   CASE WHEN label = qlabel
                        THEN 1.0 / (ln(rn + 1) / ln(2.0)) ELSE 0.0 END
                   AS DECIMAL(28,14))) AS DOUBLE) AS dcg
        FROM top GROUP BY qid
    ),
    ideal AS (
        SELECT nrel.qid,
               CAST(SUM(CAST(1.0 / (ln(g.i + 1) / ln(2.0))
                             AS DECIMAL(28,14))) AS DOUBLE) AS idcg
        FROM nrel
        JOIN (SELECT UNNEST(generate_series(1, {_NDCG_K})) AS i) g
          ON g.i <= nrel.n_rel
        GROUP BY nrel.qid
    )
    SELECT d.qid AS query_id, n.n_rel, d.dcg, i.idcg,
           d.dcg / i.idcg AS ndcg
    FROM dcg d JOIN nrel n USING (qid) JOIN ideal i ON i.qid = d.qid
    """,
)
def eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 over the 5-query label-relevance evaluation set — the
    graded companion of `eval_retrieval_rank`'s MRR. The per-query
    top-10 comes from the BUFFER-BOUNDED two-phase top-k
    (`grouped_topk_agg`), so no corpus-sized per-qid window exists;
    ranks are then a window over the 10-row result (bounded), DCG
    terms are IEEE expressions with identical parse trees on both
    engines (explicit ln(x)/ln(2)), and term sums ride DECIMAL(28,14)
    for order-independence. IDCG joins a broadcast 1..k index against
    each query's relevant-doc count."""
    from pyspark.sql import Window

    from tms_etl_spark.operators.windows import grouped_topk_agg

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _MRR_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.posexplode("embedding").alias("i", "qv"),
    )
    v = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "vv")
    )
    dd = decimal_dot
    sums = (
        v.join(F.broadcast(q), "i")
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "qlabel", "vec_id")
        .agg(
            F.any_value("label").alias("label"),
            F.round(F.sum(dd(F.col("vv"), F.col("qv"))), 8)
            .cast("double")
            .alias("dot"),
            F.round(F.sum(dd(F.col("vv"), F.col("vv"))), 8)
            .cast("double")
            .alias("nv"),
            F.round(F.sum(dd(F.col("qv"), F.col("qv"))), 8)
            .cast("double")
            .alias("nq"),
        )
    )
    scored = sums.select(
        "qid",
        "qlabel",
        "vec_id",
        "label",
        (F.col("dot") / (F.sqrt("nv") * F.sqrt("nq"))).alias("c"),
    )
    scored = scored.localCheckpoint(eager=False)
    nrel = (
        scored.where(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.count("*").cast("long").alias("n_rel"))
    )
    top = grouped_topk_agg(
        scored, ["qid"], "c", _NDCG_K, ["vec_id", "label", "qlabel"]
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("c"), F.desc("vec_id"))
    # bounded window: exactly _NDCG_K rows per qid after the top-k
    top = top.withColumn("rn", F.row_number().over(wr).cast("long"))
    term = F.when(
        F.col("label") == F.col("qlabel"),
        F.lit(1.0) / (F.log(F.col("rn") + 1) / F.log(F.lit(2.0))),
    ).otherwise(F.lit(0.0))
    dcg = top.groupBy("qid").agg(
        F.sum(term.cast("decimal(28,14)")).cast("double").alias("dcg")
    )
    idx = spark.range(1, _NDCG_K + 1).select(
        F.col("id").cast("long").alias("i")
    )
    ideal = (
        nrel.crossJoin(F.broadcast(idx))
        .where(F.col("i") <= F.col("n_rel"))
        .groupBy("qid")
        .agg(
            F.sum(
                (
                    F.lit(1.0)
                    / (F.log(F.col("i") + 1) / F.log(F.lit(2.0)))
                ).cast("decimal(28,14)")
            )
            .cast("double")
            .alias("idcg")
        )
    )
    return (
        dcg.join(nrel, "qid")
        .join(ideal, "qid")
        .select(
            F.col("qid").alias("query_id"),
            "n_rel",
            "dcg",
            "idcg",
            (F.col("dcg") / F.col("idcg")).alias("ndcg"),
        )
    )
