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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
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
    dd = lambda a, b: (a.cast("double") * b.cast("double")).cast("decimal(28,14)")
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
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _K)
        .select("vec_id", "cos_sim")
    )


@query("sim_cosine_topk")  # fold-order float sums: engine-specific ulps → rows-only
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production brute-force ANN baseline: zip_with/aggregate fold
    per row (no explode, no pre-top-k shuffle; TakeOrdered finishes).
    Agreement with the exact form is asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return cosine_topk(emb.where(F.col("vec_id") != _QUERY_VEC_ID), qv, k=_K)


@query("sim_lsh_bucketed")  # hash-derived planes: engine-specific → rows-only
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane bucket, exact re-rank within
    the query's bucket only."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return lsh_topk(emb.where(F.col("vec_id") != _QUERY_VEC_ID), qv, k=_K, n_planes=4)


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
    v = emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    a = v.select(
        F.col("vec_id").alias("vec_a"), "i", F.col("x").alias("xa")
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), "i", F.col("x").alias("xb")
    )
    dd = lambda p, q: (p.cast("double") * q.cast("double")).cast("decimal(28,14)")
    j = (
        a.join(b, "i")
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.round(F.sum(dd(F.col("xa"), F.col("xb"))), 8).cast("double").alias("dot"),
            F.round(F.sum(dd(F.col("xa"), F.col("xa"))), 8).cast("double").alias("na"),
            F.round(F.sum(dd(F.col("xb"), F.col("xb"))), 8).cast("double").alias("nb"),
        )
    )
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))
    return j.select("vec_a", "vec_b", cos.alias("cos_sim")).where(cos >= 0.4)


@query("sim_neardup_pairs_lsh")  # hash-derived buckets: rows-only
def sim_neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-bucket candidate
    generation + exact cosine within buckets (operators.similarity.
    embedding_neardup_pairs); recall vs the exact form is asserted in
    tests/test_dedup_similarity.py."""
    from tms_etl_spark.operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.35, n_planes=4)


@query("sim_ivf_topk")  # hash-seeded centroids: engine-specific → rows-only
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (operators.ivf): deterministic xxhash-sampled
    coarse centroids + one Lloyd refinement, vectorized mapInPandas
    cell assignment, exact cosine re-rank inside the query's n_probe
    nearest cells. The second ANN family next to the hyperplane LSH
    (`sim_lsh_bucketed`) — recall vs the exact scan and the
    n_probe=n_cells ≡ brute-force identity are pinned in
    tests/test_ivf.py."""
    from tms_etl_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return ivf_topk(
        emb.where(F.col("vec_id") != _QUERY_VEC_ID),
        qv,
        k=_K,
        n_cells=16,
        n_probe=6,
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
