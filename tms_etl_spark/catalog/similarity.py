"""Similarity search over the `embeddings` table (array<float>, d=64).

`sim_cosine_topk_exact` routes the dot products through DECIMAL sums
(explode → position join → exact aggregation) so Spark and DuckDB
produce bit-identical cosines — the oracle-checkable form.
`sim_cosine_topk` is the production form (zip_with/aggregate fold,
no explode, no shuffle before top-k); `sim_lsh_bucketed` is the ANN
scale path. Both are verified against the exact form in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import decimal_dot
from tms_etl_spark.operators.similarity import cosine_topk, lsh_topk
from tms_etl_spark.sources.tables import load_table

_QUERY_VEC_ID = 0
_K = 10


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.where(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").head()
    return [float(x) for x in row["embedding"]]


@query(
    "sim_cosine_topk_exact",
    oracle=f"""
    WITH q AS (
        SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS qv
        FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    ), v AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS vv
        FROM embeddings WHERE vec_id <> {_QUERY_VEC_ID}
    ), sums AS (
        SELECT v.vec_id,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(v.vv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nv,
               CAST(ROUND(SUM(CAST(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nq
        FROM v JOIN q USING (i) GROUP BY v.vec_id
    ), scored AS (
        SELECT vec_id, dot / (sqrt(nq) * sqrt(nv)) AS cos_sim,
               row_number() OVER (ORDER BY dot / (sqrt(nq) * sqrt(nv)) DESC,
                                  vec_id ASC) AS rn
        FROM sums
    )
    SELECT vec_id, cos_sim FROM scored WHERE rn <= {_K}
    """,
)
def sim_cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k in order-independent (decimal-exact)
    arithmetic: explode embeddings by position, join to the query
    vector's positions, aggregate exact sums. Bit-identical across
    engines and cluster layouts."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.posexplode("embedding").alias("i", "qv"))
    )
    v = emb.where(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", F.posexplode("embedding").alias("i", "vv")
    )
    dd = decimal_dot
    sums = (
        v.join(F.broadcast(q), "i")
        .groupBy("vec_id")
        .agg(
            F.round(F.sum(dd(F.col("vv"), F.col("qv"))), 8).cast("double").alias("dot"),
            F.round(F.sum(dd(F.col("vv"), F.col("vv"))), 8).cast("double").alias("nv"),
            F.round(F.sum(dd(F.col("qv"), F.col("qv"))), 8).cast("double").alias("nq"),
        )
    )
    scored = sums.select(
        "vec_id",
        (F.col("dot") / (F.sqrt("nq") * F.sqrt("nv"))).alias("cos_sim"),
    )
    # Distributed top-k: orderBy().limit() compiles to
    # TakeOrderedAndProject (per-partition heap + driver merge of k
    # rows), never an Exchange SinglePartition over the whole scored
    # corpus. Tiebreak on vec_id keeps the cut deterministic.
    return (
        scored.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_K)
        .select("vec_id", "cos_sim")
    )


@query(
    "sim_cosine_topk",
    oracle=f"""
    SELECT {_K} AS k,
           CAST((SELECT COUNT(*) FROM embeddings
                 WHERE vec_id <> {_QUERY_VEC_ID}) AS BIGINT) AS n_corpus,
           TRUE AS topk_ids_ok,
           TRUE AS topk_cos_ok
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production brute-force ANN baseline: zip_with/aggregate fold
    per row (no explode, no pre-top-k shuffle; TakeOrdered finishes).

    Oracle strategy (the agreement pattern proven on the other four
    ANN entries): the fold's float sums are order-dependent, so raw
    scores have engine-specific ulps and no DuckDB twin. The per-SF
    driver-pinned invariant, computed in-query: the fold's top-k over
    the FULL corpus equals the decimal-exact top-k (`_exact_rerank`,
    the same arithmetic `sim_cosine_topk_exact` hash-matches against
    DuckDB) — same ids, scores within 1e-6; the oracle recomputes the
    corpus size and pins the booleans TRUE."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    rest = emb.where(F.col("vec_id") != _QUERY_VEC_ID)
    ann = cosine_topk(rest, qv, k=_K).withColumnRenamed("cos_sim", "cos_ann")
    exact = _exact_rerank(rest, qv, _K)
    cmp = exact.join(ann, "vec_id", "full")
    summary = cmp.agg(
        F.count(
            F.when(F.col("cos_ann").isNull() | F.col("cos_exact").isNull(), 1)
        ).alias("miss"),
        F.max(F.abs(F.col("cos_ann") - F.col("cos_exact"))).alias("maxdiff"),
    )
    n_corpus = rest.agg(F.count("*").alias("n_corpus"))
    return n_corpus.crossJoin(summary).select(
        F.lit(_K).alias("k"),
        "n_corpus",
        (F.col("miss") == 0).alias("topk_ids_ok"),
        (F.coalesce(F.col("maxdiff"), F.lit(0.0)) <= 1e-6).alias("topk_cos_ok"),
    )


def _exact_rerank(sub: DataFrame, query_vec: list[float], k: int) -> DataFrame:
    """Decimal-exact cosine top-k (vec_id, cos_exact) over ``sub`` —
    the order-independent arithmetic twin used to pin the ANN paths'
    float-fold re-rank in-query (posexplode + decimal sums, same
    discipline as sim_cosine_topk_exact)."""
    spark = sub.sparkSession
    q = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(query_vec)], "i int, qv double"
    )
    v = sub.select("vec_id", F.posexplode("embedding").alias("i", "vv"))
    dd = decimal_dot
    sums = (
        v.join(F.broadcast(q), "i")
        .groupBy("vec_id")
        .agg(
            F.round(F.sum(dd(F.col("vv"), F.col("qv"))), 8).cast("double").alias("dot"),
            F.round(F.sum(dd(F.col("vv"), F.col("vv"))), 8).cast("double").alias("nv"),
            F.round(F.sum(dd(F.col("qv"), F.col("qv"))), 8).cast("double").alias("nq"),
        )
    )
    scored = sums.select(
        "vec_id",
        (F.col("dot") / (F.sqrt("nq") * F.sqrt("nv"))).alias("cos_exact"),
    )
    # TakeOrdered, not a single-partition row_number window — this
    # helper feeds retrieval_rrf_fusion and the ANN agreement gates,
    # so its plan shape matters at corpus scale.
    return (
        scored.orderBy(F.desc("cos_exact"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cos_exact")
    )


@query(
    "sim_lsh_bucketed",
    oracle=f"""
    SELECT {_K} AS k,
           CAST((SELECT COUNT(*) FROM embeddings
                 WHERE vec_id <> {_QUERY_VEC_ID}) AS BIGINT) AS n_corpus,
           TRUE AS rerank_ids_ok,
           TRUE AS rerank_cos_ok
    """,
)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane bucket, exact re-rank within
    the query's probe buckets only.

    Oracle strategy: the bucket ids are xxhash-derived (no DuckDB
    twin) and the synthetic embeddings are near-random, so recall@k
    of the GLOBAL top-k is low by construction (statistical recall is
    pinned on planted duplicates in tests/test_dedup_similarity.py).
    What IS invariant — and what this entry has the driver pin per
    scale factor — is the operator's exactness contract: the ANN
    result must equal the decimal-exact cosine top-k restricted to
    the same probed buckets, ids and scores (float fold vs decimal
    arithmetic cross-check computed in-query; the oracle pins the
    booleans TRUE and recomputes the corpus size)."""
    from tms_etl_spark.operators.similarity import (
        hyperplane_bucket,
        query_probe_buckets,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    rest = emb.where(F.col("vec_id") != _QUERY_VEC_ID)
    ann = lsh_topk(rest, qv, k=_K, n_planes=4).withColumnRenamed(
        "cos_sim", "cos_ann"
    )
    # the same probe restriction lsh_topk applies internally
    qbuckets = query_probe_buckets(qv, n_planes=4, n_probes=2)
    restricted = rest.withColumn(
        "__bucket", hyperplane_bucket("embedding", 4, len(qv))
    ).where(F.col("__bucket").isin(qbuckets))
    exact = _exact_rerank(restricted, qv, _K)
    cmp = exact.join(ann, "vec_id", "full")
    summary = cmp.agg(
        F.count(
            F.when(F.col("cos_ann").isNull() | F.col("cos_exact").isNull(), 1)
        ).alias("miss"),
        F.max(F.abs(F.col("cos_ann") - F.col("cos_exact"))).alias("maxdiff"),
    )
    n_corpus = rest.agg(F.count("*").alias("n_corpus"))
    return n_corpus.crossJoin(summary).select(
        F.lit(_K).alias("k"),
        "n_corpus",
        (F.col("miss") == 0).alias("rerank_ids_ok"),
        (F.coalesce(F.col("maxdiff"), F.lit(0.0)) <= 1e-6).alias("rerank_cos_ok"),
    )


@query(
    "sim_neardup_pairs_exact",
    oracle="""
    WITH v AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS x
        FROM embeddings WHERE vec_id < 1000
    ), j AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(ROUND(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS na,
               CAST(ROUND(SUM(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS nb
        FROM v a JOIN v b USING (i)
        WHERE a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_a, vec_b, dot / (sqrt(na) * sqrt(nb)) AS cos_sim
    FROM j WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4
    """,
)
def sim_neardup_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.4), decimal-exact
    all-pairs form for the oracle. The production path is the
    LSH-bucketed `sim_neardup_pairs_lsh` — this exact form exists to
    pin the semantics (and is itself a legitimate brute-force baseline
    at moderate corpus sizes). Bounded to a 1000-vector slice so the
    O(n²·d) exact form stays tractable at any sf (the LSH twin is the
    unbounded path)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    return _exact_pairs(emb, 0.4).withColumnRenamed("cos_exact", "cos_sim")


def _exact_pairs(emb_slice: DataFrame, min_cos: float) -> DataFrame:
    """Decimal-exact all-pairs cosine ≥ ``min_cos`` over a BOUNDED
    slice — (vec_a, vec_b, cos_exact). Shared by the exact near-dup
    entry and the LSH agreement entry."""
    v = emb_slice.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    a = v.select(F.col("vec_id").alias("vec_a"), "i", F.col("x").alias("xa"))
    b = v.select(F.col("vec_id").alias("vec_b"), "i", F.col("x").alias("xb"))
    dd = decimal_dot
    # broadcast the probe side: the join key (position i) has only
    # `dim` distinct values, so a shuffle join degenerates to dim-way
    # parallelism with ~n²/dim rows per key; broadcasting keeps the
    # fan-out spread across the build side's partitions (measured 4×
    # on the sf0.1 slice). The slice is bounded, so the broadcast is.
    j = (
        a.join(F.broadcast(b), "i")
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.round(F.sum(dd(F.col("xa"), F.col("xb"))), 8).cast("double").alias("dot"),
            F.round(F.sum(dd(F.col("xa"), F.col("xa"))), 8).cast("double").alias("na"),
            F.round(F.sum(dd(F.col("xb"), F.col("xb"))), 8).cast("double").alias("nb"),
        )
    )
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))
    return j.select("vec_a", "vec_b", cos.alias("cos_exact")).where(
        cos >= min_cos
    )


@query(
    "sim_neardup_pairs_lsh",
    oracle="""
    WITH v AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS x
        FROM embeddings WHERE vec_id < 1000
    ), j AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(ROUND(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS na,
               CAST(ROUND(SUM(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE)
                              AS DECIMAL(28,14))), 8) AS DOUBLE) AS nb
        FROM v a JOIN v b USING (i)
        WHERE a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), p AS (
        SELECT vec_a, vec_b, dot / (sqrt(na) * sqrt(nb)) AS cos_exact FROM j
    )
    SELECT CAST(COUNT(*) FILTER (WHERE cos_exact >= 0.4) AS BIGINT)
             AS n_exact_04,
           TRUE AS found_any, TRUE AS subset_ok, TRUE AS cos_match_ok
    FROM p
    """,
)
def sim_neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-bucket candidate
    generation + exact cosine within buckets (operators.similarity.
    embedding_neardup_pairs).

    Oracle strategy: the candidate buckets are hash-derived and
    recall of WEAK pairs on near-random embeddings is bucket-limited
    by construction (statistical recall is pinned on planted
    duplicates in tests). The invariants the driver pins per scale
    factor, computed in-query against the decimal-exact all-pairs
    twin on the bounded vec_id<1000 slice: every LSH pair is a true
    pair (subset, with 1e-6 score tolerance across the float/decimal
    arithmetic), its score matches the exact cosine, and the pair set
    is non-empty; the oracle recomputes the exact 0.4-threshold pair
    count from scratch."""
    from tms_etl_spark.operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    lsh = (
        embedding_neardup_pairs(emb, threshold=0.35, n_planes=4)
        .where((F.col("vec_a") < 1000) & (F.col("vec_b") < 1000))
        .withColumnRenamed("cos_sim", "cos_lsh")
    )
    # margin below the LSH threshold so float-vs-decimal boundary ulps
    # cannot make a genuinely-found pair look like a subset violation.
    # ONE pass over the (expensive, bounded) exact twin: full-outer
    # join + a single aggregation computes the exact-pair count, the
    # subset check and the score agreement together.
    exact = _exact_pairs(emb.where(F.col("vec_id") < 1000), 0.30)
    cmp = lsh.withColumn("__l", F.lit(1)).join(
        exact, ["vec_a", "vec_b"], "full"
    )
    summary = cmp.agg(
        F.count(F.when(F.col("cos_exact") >= 0.4, 1)).alias("n_exact_04"),
        F.count(F.when(F.col("__l") == 1, 1)).alias("n_lsh"),
        F.count(
            F.when(
                (F.col("__l") == 1)
                & (
                    F.col("cos_exact").isNull()
                    | (F.col("cos_exact") < 0.35 - 1e-6)
                ),
                1,
            )
        ).alias("subset_viol"),
        F.max(F.abs(F.col("cos_lsh") - F.col("cos_exact"))).alias("maxdiff"),
    )
    return summary.select(
        F.col("n_exact_04").cast("long").alias("n_exact_04"),
        (F.col("n_lsh") > 0).alias("found_any"),
        (F.col("subset_viol") == 0).alias("subset_ok"),
        (F.coalesce(F.col("maxdiff"), F.lit(0.0)) <= 1e-6).alias("cos_match_ok"),
    )


@query(
    "sim_ivf_topk",
    oracle=f"""
    SELECT {_K} AS k,
           CAST((SELECT COUNT(*) FROM embeddings
                 WHERE vec_id <> {_QUERY_VEC_ID}) AS BIGINT) AS n_corpus,
           TRUE AS rerank_ids_ok,
           TRUE AS rerank_cos_ok
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (operators.ivf): deterministic xxhash-sampled
    coarse centroids, vectorized mapInPandas cell assignment, exact
    cosine re-rank inside the query's n_probe nearest cells. The
    second ANN family next to the hyperplane LSH (`sim_lsh_bucketed`).

    Oracle strategy mirrors sim_lsh_bucketed: cell membership is
    hash-seeded (no DuckDB twin) and global-top-k recall on
    near-random embeddings is probe-limited by construction
    (statistical recall + the n_probe=n_cells ≡ brute-force identity
    are pinned in tests/test_ivf.py). The per-SF driver-pinned
    invariant: the ANN result equals the decimal-exact top-k over the
    probed cells' members — ids and scores (float vs decimal
    cross-check, computed in-query)."""
    from tms_etl_spark.operators.ivf import (
        assign_cells,
        ivf_topk,
        query_cells,
        sample_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    rest = emb.where(F.col("vec_id") != _QUERY_VEC_ID)
    cents = sample_centroids(rest, 16)
    ann = ivf_topk(
        rest, qv, k=_K, n_cells=16, n_probe=6, centroids=cents
    ).withColumnRenamed("cos_sim", "cos_ann")
    probed = query_cells(qv, cents, 6)
    restricted = assign_cells(rest, cents).where(F.col("cell").isin(probed))
    exact = _exact_rerank(restricted, qv, _K)
    cmp = exact.join(ann, "vec_id", "full")
    summary = cmp.agg(
        F.count(
            F.when(F.col("cos_ann").isNull() | F.col("cos_exact").isNull(), 1)
        ).alias("miss"),
        F.max(F.abs(F.col("cos_ann") - F.col("cos_exact"))).alias("maxdiff"),
    )
    n_corpus = rest.agg(F.count("*").alias("n_corpus"))
    return n_corpus.crossJoin(summary).select(
        F.lit(_K).alias("k"),
        "n_corpus",
        (F.col("miss") == 0).alias("rerank_ids_ok"),
        (F.coalesce(F.col("maxdiff"), F.lit(0.0)) <= 1e-6).alias("rerank_cos_ok"),
    )


@query(
    "sim_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings
    )
    SELECT e.vec_id,
           CAST(s.maxabs / 127.0 AS DOUBLE) AS scale,
           array_to_string(list_transform(e.embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                               / (CASE WHEN s.maxabs = 0 THEN 1.0
                                       ELSE s.maxabs END) + 0.5)
                         AS INTEGER)), ',') AS qvec
    FROM embeddings e JOIN s USING (vec_id)
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-side
    operator of an embedding pipeline (4× smaller than float32, ~1%
    cosine error; dequantization error bound pinned in
    tests/test_ivf.py). Exactness discipline: quantized value =
    floor(x·127/max|x| + 0.5) — one multiply, one divide, one add,
    one floor, all IEEE-deterministic, so Spark and DuckDB agree
    bit-for-bit (no round() whose half-even ties differ)."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    safe = F.when(F.col("maxabs") == 0, F.lit(1.0)).otherwise(F.col("maxabs"))
    return (
        emb.withColumn("maxabs", maxabs)
        .select(
            "vec_id",
            (F.col("maxabs") / 127.0).alias("scale"),
            # serialized as a CSV string: int-array dtypes round-trip
            # differently through Arrow/pandas across engines (numpy
            # array vs list), which breaks repr-based row alignment
            F.array_join(
                F.transform(
                    F.col("embedding"),
                    lambda v: F.floor(v.cast("double") * 127.0 / safe + 0.5).cast(
                        "int"
                    ),
                ),
                ",",
            ).alias("qvec"),
        )
    )


@query(
    "embedding_centroid_per_label",
    oracle="""
    WITH comp AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS x
        FROM embeddings
    )
    SELECT label, pos,
           CAST(ROUND(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14))), 8)
                AS DOUBLE) / COUNT(*) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM comp
    GROUP BY label, pos
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid of the embedding column — the building
    block of nearest-centroid classification, IVF coarse training,
    and cluster drift monitoring. Long form (label, pos, component):
    posexplode → one partial-aggregating shuffle on the tiny
    (label × dim) key — at 100 TB the map-side combine reduces each
    partition to |labels|·dim rows before the exchange, so the
    shuffle is O(labels·dim·partitions), independent of row count.
    Component sums ride DECIMAL(28,14) (the float→double cast is
    exact, so both engines coerce identical values) and the final
    mean is one double divide — bit-stable cross-engine. Array
    re-assembly (collect back to vector form) is
    `F.array_sort(F.collect_list(F.struct(pos, val)))`-based and
    pinned in tests; the oracle compares the long form to avoid
    float-repr drift in string-serialized arrays."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    xs = F.col("x").cast("double").cast("decimal(28,14)")
    return comp.groupBy("label", "pos").agg(
        (F.round(F.sum(xs), 8).cast("double") / F.count("*")).alias("centroid"),
        F.count("*").cast("long").alias("n_vectors"),
    )


@query(
    "embedding_label_outliers",
    oracle="""
    WITH comp2 AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), cent AS (
        SELECT label AS cand_label, pos,
               CAST(ROUND(SUM(CAST(x AS DECIMAL(28,14))), 8) AS DOUBLE)
                 / COUNT(*) AS c
        FROM comp2 GROUP BY label, pos
    ), cnorm AS (
        SELECT cand_label,
               CAST(ROUND(SUM(CAST(c * c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nc
        FROM cent GROUP BY cand_label
    ), vnorm AS (
        SELECT vec_id,
               CAST(ROUND(SUM(CAST(x * x AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nv
        FROM comp2 GROUP BY vec_id
    ), dots AS (
        SELECT comp2.vec_id, comp2.label, cent.cand_label,
               CAST(ROUND(SUM(CAST(comp2.x * cent.c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS dot
        FROM comp2 JOIN cent ON cent.pos = comp2.pos
        GROUP BY comp2.vec_id, comp2.label, cent.cand_label
    ), cosed AS (
        SELECT d.vec_id, d.label, d.cand_label,
               d.dot / (sqrt(v.nv) * sqrt(c.nc)) AS cos,
               row_number() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY d.dot / (sqrt(v.nv) * sqrt(c.nc)) DESC,
                            d.cand_label
               ) AS rk
        FROM dots d
        JOIN vnorm v USING (vec_id)
        JOIN cnorm c USING (cand_label)
    )
    SELECT b.vec_id, b.label,
           b.cand_label AS predicted_label,
           o.cos AS own_cos,
           b.cos AS best_cos,
           (b.cand_label <> b.label) AS is_suspect
    FROM cosed b JOIN cosed o
      ON o.vec_id = b.vec_id AND o.cand_label = o.label
    WHERE b.rk = 1
    """,
)
def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection by nearest-centroid disagreement
    (confident-learning-lite): every vector is scored against all
    per-label centroids; a vector whose best-cosine centroid is not
    its own label is a suspected mislabel — the triage list a
    training pipeline reviews before the data ships. All dot
    products and norms ride DECIMAL(28,12) exact sums and the final
    cosine is a fixed-parse-tree double expression, so the argmax
    (with a label tie-break) is bit-deterministic cross-engine.
    Shape: centroids are a (labels x dims) table joined on pos
    (broadcast-sized at any corpus scale); the only corpus-sized
    shuffles are the (vec, cand_label) dot aggregation and the
    per-vec norm — both partial-aggregate map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = comp.groupBy(
        F.col("label").alias("cand_label"), "pos"
    ).agg(
        (
            F.round(F.sum(F.col("x").cast("decimal(28,14)")), 8).cast(
                "double"
            )
            / F.count("*")
        ).alias("c")
    )
    cnorm = cent.groupBy("cand_label").agg(
        F.round(
            F.sum((F.col("c") * F.col("c")).cast("decimal(28,12)")), 8
        )
        .cast("double")
        .alias("nc")
    )
    vnorm = comp.groupBy("vec_id").agg(
        F.round(
            F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)")), 8
        )
        .cast("double")
        .alias("nv")
    )
    dots = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "cand_label")
        .agg(
            F.round(
                F.sum((F.col("x") * F.col("c")).cast("decimal(28,12)")),
                8,
            )
            .cast("double")
            .alias("dot")
        )
    )
    from pyspark.sql.window import Window

    cos = F.col("dot") / (F.sqrt(F.col("nv")) * F.sqrt(F.col("nc")))
    cosed = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "cand_label")
        .select(
            "vec_id",
            "label",
            "cand_label",
            cos.alias("cos"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("cos"), F.col("cand_label")
                )
            ),
        )
    )
    best = cosed.where(F.col("rk") == 1).select(
        "vec_id",
        "label",
        F.col("cand_label").alias("predicted_label"),
        F.col("cos").alias("best_cos"),
    )
    own = cosed.where(F.col("cand_label") == F.col("label")).select(
        "vec_id", F.col("cos").alias("own_cos")
    )
    return best.join(own, "vec_id").select(
        "vec_id",
        "label",
        "predicted_label",
        "own_cos",
        "best_cos",
        (F.col("predicted_label") != F.col("label")).alias("is_suspect"),
    )


@query(
    "eval_classifier_metrics",
    oracle="""
    WITH comp2 AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), cent AS (
        SELECT label AS cand_label, pos,
               CAST(ROUND(SUM(CAST(x AS DECIMAL(28,14))), 8) AS DOUBLE)
                 / COUNT(*) AS c
        FROM comp2 GROUP BY label, pos
    ), cnorm AS (
        SELECT cand_label,
               CAST(ROUND(SUM(CAST(c * c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nc
        FROM cent GROUP BY cand_label
    ), vnorm AS (
        SELECT vec_id,
               CAST(ROUND(SUM(CAST(x * x AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nv
        FROM comp2 GROUP BY vec_id
    ), dots AS (
        SELECT comp2.vec_id, comp2.label, cent.cand_label,
               CAST(ROUND(SUM(CAST(comp2.x * cent.c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS dot
        FROM comp2 JOIN cent ON cent.pos = comp2.pos
        GROUP BY comp2.vec_id, comp2.label, cent.cand_label
    ), cosed AS (
        SELECT d.vec_id, d.label, d.cand_label,
               row_number() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY d.dot / (sqrt(v.nv) * sqrt(c.nc)) DESC,
                            d.cand_label
               ) AS rk
        FROM dots d
        JOIN vnorm v USING (vec_id)
        JOIN cnorm c USING (cand_label)
    ), pred AS (
        SELECT vec_id, label, cand_label AS predicted
        FROM cosed WHERE rk = 1
    ), classes AS (
        SELECT DISTINCT label AS cls FROM embeddings
    ), m AS (
        SELECT cls,
               CAST((SELECT COUNT(*) FROM pred
                     WHERE label = cls AND predicted = cls) AS BIGINT)
                 AS tp,
               CAST((SELECT COUNT(*) FROM pred
                     WHERE predicted = cls AND label <> cls) AS BIGINT)
                 AS fp,
               CAST((SELECT COUNT(*) FROM pred
                     WHERE label = cls AND predicted <> cls) AS BIGINT)
                 AS fn
        FROM classes
    )
    SELECT cls, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
           END AS f1
    FROM m
    """,
)
def eval_classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval metrics at engine scale: per-class TP/FP/FN and
    precision/recall/F1 of the nearest-centroid classifier
    (reusing `embedding_label_outliers`' bit-deterministic
    predictions). F1 uses the 2tp/(2tp+fp+fn) form — one exact
    integer expression per cell, so every metric double
    hash-matches. Shape: predictions reduce to a
    (classes x classes) confusion grain map-side; metric arithmetic
    runs on |classes| rows."""
    pred = embedding_label_outliers(spark, sf_dir).select(
        "label", "predicted_label"
    )
    grid = pred.groupBy("label", "predicted_label").agg(
        F.count("*").cast("long").alias("n")
    )
    classes = grid.select(F.col("label").alias("cls")).distinct()
    tp = grid.where(F.col("label") == F.col("predicted_label")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    fp = (
        grid.where(F.col("label") != F.col("predicted_label"))
        .groupBy(F.col("predicted_label").alias("cls"))
        .agg(F.sum("n").cast("long").alias("fp"))
    )
    fn = (
        grid.where(F.col("label") != F.col("predicted_label"))
        .groupBy(F.col("label").alias("cls"))
        .agg(F.sum("n").cast("long").alias("fn"))
    )
    m = (
        classes.join(tp, "cls", "left")
        .join(fp, "cls", "left")
        .join(fn, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("long").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("long").alias("fn"),
        )
    )
    tp_, fp_, fn_ = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.when(tp_ + fp_ > 0, tp_.cast("double") / (tp_ + fp_)).alias(
            "precision"
        ),
        F.when(tp_ + fn_ > 0, tp_.cast("double") / (tp_ + fn_)).alias(
            "recall"
        ),
        F.when(
            2 * tp_ + fp_ + fn_ > 0,
            (2 * tp_).cast("double") / (2 * tp_ + fp_ + fn_),
        ).alias("f1"),
    )


_PQ_M = 8
_PQ_KSUB = 16


@query(
    "sim_pq_adc",
    oracle=f"""
    SELECT {_K} AS k,
           CAST((SELECT COUNT(*) FROM embeddings
                 WHERE vec_id <> {_QUERY_VEC_ID}) AS BIGINT) AS n_corpus,
           {_PQ_M} AS m_codes_per_vector,
           TRUE AS adc_ids_ok,
           TRUE AS adc_cos_ok
    """,
)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators.pq — Jégou et al., TPAMI
    2011): per-subspace codebooks, vectors encoded to m={_PQ_M} bytes
    (32x compression for d=64 float32), queries scored by asymmetric
    distance — a pure-JVM lookup-table expression over the code
    arrays, no decode, TakeOrdered finish. The third ANN family next
    to hyperplane LSH (`sim_lsh_bucketed`) and IVF (`sim_ivf_topk`);
    at 100 TB this is the one whose index fits in RAM.

    Oracle strategy (the ANN agreement pattern): codebooks are
    data-derived (no DuckDB twin), but ADC cosine over the subspace
    decomposition is EXACTLY the cosine between the query and the
    quantized reconstruction. The in-query gate recomputes that
    cosine through the decimal-exact explode/join path (the
    `sim_cosine_topk_exact` arithmetic) over the reconstructions and
    pins: the ADC top-k equals the decimal top-k, ids and scores
    within 1e-6; the oracle re-derives the corpus size and constants."""
    from tms_etl_spark.operators.pq import pq_encode, pq_topk, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    rest = emb.where(F.col("vec_id") != _QUERY_VEC_ID)
    books = train_pq_codebooks(rest, m=_PQ_M, ksub=_PQ_KSUB, lloyd_iters=1)
    ann = pq_topk(rest, qv, k=_K, codebooks=books).withColumnRenamed(
        "cos_sim", "cos_ann"
    )

    # decimal-exact twin: reconstruction components from the codebook
    # (m·ksub·ds rows — index metadata) joined to each vector's codes,
    # then the order-independent decimal dot against the query
    ds = len(books[0][0])
    comp_rows = [
        (j, c, dim, float(books[j][c][dim]))
        for j in range(_PQ_M)
        for c in range(_PQ_KSUB)
        for dim in range(ds)
    ]
    cdf = spark.createDataFrame(
        comp_rows, "j int, code int, dim int, cx double"
    )
    qdf = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(qv)], "i int, qv double"
    )
    codes = pq_encode(rest, books).select(
        "vec_id", F.posexplode("codes").alias("j", "code")
    )
    recon = codes.join(F.broadcast(cdf), ["j", "code"]).select(
        "vec_id",
        (F.col("j") * ds + F.col("dim")).alias("i"),
        "cx",
    )
    dd = decimal_dot
    sums = (
        recon.join(F.broadcast(qdf), "i")
        .groupBy("vec_id")
        .agg(
            F.round(F.sum(dd(F.col("cx"), F.col("qv"))), 8).cast("double").alias("dot"),
            F.round(F.sum(dd(F.col("cx"), F.col("cx"))), 8).cast("double").alias("nv"),
            F.round(F.sum(dd(F.col("qv"), F.col("qv"))), 8).cast("double").alias("nq"),
        )
    )
    exact = (
        sums.select(
            "vec_id",
            (F.col("dot") / (F.sqrt("nq") * F.sqrt("nv"))).alias("cos_exact"),
        )
        .orderBy(F.desc("cos_exact"), F.asc("vec_id"))
        .limit(_K)
    )
    cmp = exact.join(ann, "vec_id", "full")
    summary = cmp.agg(
        F.count(
            F.when(F.col("cos_ann").isNull() | F.col("cos_exact").isNull(), 1)
        ).alias("miss"),
        F.max(F.abs(F.col("cos_ann") - F.col("cos_exact"))).alias("maxdiff"),
    )
    n_corpus = rest.agg(F.count("*").alias("n_corpus"))
    return n_corpus.crossJoin(summary).select(
        F.lit(_K).alias("k"),
        "n_corpus",
        F.lit(_PQ_M).alias("m_codes_per_vector"),
        (F.col("miss") == 0).alias("adc_ids_ok"),
        (F.coalesce(F.col("maxdiff"), F.lit(0.0)) <= 1e-6).alias("adc_cos_ok"),
    )


_N_ANCHORS = 20


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH a AS (
        SELECT vec_id AS aid, label AS albl,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS av
        FROM embeddings WHERE vec_id < {_N_ANCHORS}
    ), v AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS vv
        FROM embeddings
    ), sums AS (
        SELECT a.aid, v.vec_id,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(a.av AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS dot,
               CAST(ROUND(SUM(CAST(CAST(v.vv AS DOUBLE) * CAST(v.vv AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS nv,
               CAST(ROUND(SUM(CAST(CAST(a.av AS DOUBLE) * CAST(a.av AS DOUBLE)
                             AS DECIMAL(28,14))), 8) AS DOUBLE) AS na
        FROM v JOIN a ON v.i = a.i AND v.label <> a.albl
        GROUP BY a.aid, v.vec_id
    ), scored AS (
        SELECT aid, vec_id, dot / (sqrt(na) * sqrt(nv)) AS cos_sim,
               row_number() OVER (
                   PARTITION BY aid
                   ORDER BY dot / (sqrt(na) * sqrt(nv)) DESC, vec_id ASC
               ) AS rn
        FROM sums
    )
    SELECT aid AS anchor_id, vec_id AS negative_id, cos_sim
    FROM scored WHERE rn = 1
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (a bounded sample, vec_id < {N}) the single most-similar vector
    with a DIFFERENT label — the pair a contrastive loss learns most
    from. Scale shape: the anchor side is SAMPLE-sized and
    broadcasts; the corpus is scanned once; per-(anchor, vec) scores
    are one partial-combined aggregate; the final per-anchor argmax
    is a struct-max AGGREGATION (no window over the scored corpus).
    This harness form keeps the dot products decimal-exact so DuckDB
    hash-matches; a production variant at 100 TB would route
    candidate generation through the ANN ladder (IVF/LSH/PQ) and
    rerank exactly, as `operators/retrieval.py:_exact_rerank` does.
    Label inequality also excludes self-pairs for free."""
    from tms_etl_spark.catalog.exact import decimal_dot as dd

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.posexplode("embedding").alias("i", "av"),
    )
    v = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "vv")
    )
    sums = (
        v.join(
            F.broadcast(a),
            (v["i"] == a["i"]) & (v["label"] != a["albl"]),
        )
        .groupBy("aid", "vec_id")
        .agg(
            F.round(F.sum(dd(F.col("vv"), F.col("av"))), 8)
            .cast("double")
            .alias("dot"),
            F.round(F.sum(dd(F.col("vv"), F.col("vv"))), 8)
            .cast("double")
            .alias("nv"),
            F.round(F.sum(dd(F.col("av"), F.col("av"))), 8)
            .cast("double")
            .alias("na"),
        )
    )
    scored = sums.select(
        "aid",
        "vec_id",
        (F.col("dot") / (F.sqrt("na") * F.sqrt("nv"))).alias("cos_sim"),
    )
    return (
        scored.groupBy("aid")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_sim"), (-F.col("vec_id")).alias("nid")
                )
            ).alias("b")
        )
        .select(
            F.col("aid").alias("anchor_id"),
            (-F.col("b.nid")).alias("negative_id"),
            F.col("b.cos_sim").alias("cos_sim"),
        )
    )
