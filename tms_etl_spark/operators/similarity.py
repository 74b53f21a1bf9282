"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk``: brute-force cosine against a query vector using
  JVM higher-order functions (zip_with + aggregate) — O(n·d), no
  Python in the loop, embarrassingly parallel, no shuffle until the
  final top-k (TakeOrderedAndProject). The right baseline at any
  scale where a full scan is affordable.
- ``lsh_topk``: random-hyperplane LSH — deterministic pseudo-planes
  derived from xxhash64, bucket by sign-bit prefix, re-rank only
  within the query's bucket. Scan cost drops to the bucket's share;
  the shuffle keys on the bucket id. The 100 TB path: bucket the
  corpus once (write bucketed), then each query probes one bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force top-k by cosine similarity to ``query_vec``.

    The query vector is a literal array (broadcast by value into the
    codegen'd expression); ranking is a bounded TakeOrdered, not a
    global sort.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        "vec_id", cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def hyperplane_bucket(vec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Deterministic random-hyperplane bucket id (0..2^n_planes-1).

    Plane weights are pseudo-random in [-1, 1): derived from
    xxhash64(plane, coord) — reproducible across runs and cluster
    layouts, no RNG state to ship."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(
            *[
                (
                    (F.xxhash64(F.lit(p), F.lit(i)) % 10000).cast("double") / 5000.0
                )
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), w, lambda x, wi: x.cast("double") * wi),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.shiftleft(
            F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to the query's LSH
    bucket. Recall < 1 by construction (the usual trade); increase
    recall with multi-probe (flipping low-margin bits) if needed."""
    dim = len(query_vec)
    bucketed = df.withColumn("__bucket", hyperplane_bucket(vec_col, n_planes, dim))
    qdf = df.sparkSession.createDataFrame(
        [(query_vec,)], f"{vec_col}: array<double>"
    ).withColumn("__bucket", hyperplane_bucket(vec_col, n_planes, dim))
    qb = [r["__bucket"] for r in qdf.collect()][0]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("__bucket") == qb)
        .select("vec_id", cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-restricted.

    Candidate pairs come from shared hyperplane buckets (shuffle on
    the bucket id — never an all-pairs cross join); the exact cosine
    re-rank runs only within buckets. Raising ``n_planes`` shrinks
    buckets (cheaper, lower recall); multi-probe can recover recall.
    """
    b = df.withColumn("__bucket", hyperplane_bucket(vec_col, n_planes))
    lhs = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("emb_a"),
        "__bucket",
    )
    rhs = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("emb_b"),
        "__bucket",
    )
    cand = lhs.join(rhs, "__bucket").where(F.col("vec_a") < F.col("vec_b"))
    cos = cosine(F.col("emb_a"), F.col("emb_b"))
    return cand.select("vec_a", "vec_b", cos.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )
