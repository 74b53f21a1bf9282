"""Similarity search over embedding columns (array<float>).

Three paths:

- ``cosine_topk``: brute-force cosine against a query vector using
  JVM higher-order functions (zip_with + aggregate) — O(n·d), no
  Python in the loop, embarrassingly parallel, no shuffle until the
  final top-k (TakeOrderedAndProject). The right baseline at any
  scale where a full scan is affordable.
- ``lsh_topk``: random-hyperplane LSH — deterministic pseudo-planes
  derived from xxhash64, bucket by sign-bit prefix, re-rank only
  within the query's probe buckets. Scan cost drops to the buckets'
  share; the shuffle keys on the bucket id. The 100 TB path: bucket
  the corpus once (write bucketed), then each query probes a handful
  of buckets.
- ``embedding_neardup_pairs``: corpus-level near-duplicate pairs via
  shared probe buckets (shuffle on bucket id, never an all-pairs
  cross join), exact cosine re-rank within buckets.

Multi-probe: a sign-bit bucket misses neighbors that sit just across
a hyperplane. The standard fix (multi-probe LSH) also checks the
buckets obtained by flipping the LOWEST-MARGIN bits — the planes the
vector is closest to. ``n_probes`` extra buckets ≈ recall of
``n_probes+1`` independent tables at one table's storage cost.

Because the planes are *deterministically derived from xxhash64*, a
literal query vector's buckets are computed driver-side in plain
Python (``functions.xxhash`` bit-matches Spark's hash) — zero Spark
jobs for the query side of a lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tms_etl_spark.functions.xxhash import srem, xxhash64_ints


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


def _plane_weight(p: int, i: int) -> float:
    """Driver-side twin of the JVM plane-weight expression below —
    same xxhash64, same signed %, same scaling."""
    return srem(xxhash64_ints(p, i), 10000) / 5000.0


def plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """The hyperplane family as plain Python floats (per plane, per
    coordinate). Bit-identical to what the JVM expression computes."""
    return [[_plane_weight(p, i) for i in range(dim)] for p in range(n_planes)]


def _projections(vec_col: str, n_planes: int, dim: int) -> Column:
    """array<double> of the vector's projection onto each plane.
    Plane weights are pseudo-random in [-1, 1): derived from
    xxhash64(plane, coord) — reproducible across runs and cluster
    layouts, no RNG state to ship."""
    projs = []
    for p in range(n_planes):
        w = F.array(
            *[
                (
                    (F.xxhash64(F.lit(p), F.lit(i)) % 10000).cast("double") / 5000.0
                )
                for i in range(dim)
            ]
        )
        projs.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), w, lambda x, wi: x.cast("double") * wi),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*projs)


def _bucket_from_projs(projs: Column, n_planes: int) -> Column:
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket + F.shiftleft(
            F.when(F.element_at(projs, p + 1) > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
            p,
        )
    return bucket


def hyperplane_bucket(vec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Deterministic random-hyperplane bucket id (0..2^n_planes-1)."""
    return _bucket_from_projs(_projections(vec_col, n_planes, dim), n_planes)


def probe_buckets(
    vec_col: str, n_planes: int, dim: int, n_probes: int
) -> Column:
    """array<long> of 1 + n_probes bucket ids to probe: the primary
    bucket plus the buckets reached by flipping each of the
    ``n_probes`` lowest-|margin| sign bits (multi-probe LSH)."""
    projs = _projections(vec_col, n_planes, dim)
    primary = _bucket_from_projs(projs, n_planes)
    if n_probes <= 0:
        return F.array(primary)
    # planes ordered by |projection| ascending (closest plane first)
    order = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(F.element_at(projs, p + 1)).alias("m"),
                    F.lit(p).alias("p"),
                )
                for p in range(n_planes)
            ]
        )
    )
    probes = [primary]
    for j in range(min(n_probes, n_planes)):
        p_j = F.element_at(order, j + 1)["p"]
        mask = F.pow(F.lit(2.0), p_j.cast("double")).cast("long")
        probes.append(primary.bitwiseXOR(mask))
    return F.array(*probes)


def query_probe_buckets(
    query_vec: list[float], n_planes: int, n_probes: int = 0
) -> list[int]:
    """Driver-side probe buckets for a literal query vector — plain
    Python arithmetic over the same xxhash64-derived planes, so no
    Spark job runs to find where a query lands."""
    dim = len(query_vec)
    projs = [
        sum(float(x) * w for x, w in zip(query_vec, plane))
        for plane in plane_weights(n_planes, dim)
    ]
    primary = sum((1 << p) for p, pr in enumerate(projs) if pr > 0)
    flips = sorted(range(n_planes), key=lambda p: (abs(projs[p]), p))
    return [primary] + [primary ^ (1 << p) for p in flips[: max(0, n_probes)]]


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_probes: int = 2,
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to the query's probe
    buckets (primary + ``n_probes`` lowest-margin bit flips). The
    query's buckets are computed driver-side — the only Spark job is
    the bucketed scan itself."""
    dim = len(query_vec)
    qbuckets = query_probe_buckets(query_vec, n_planes, n_probes)
    bucketed = df.withColumn("__bucket", hyperplane_bucket(vec_col, n_planes, dim))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("__bucket").isin(qbuckets))
        .select("vec_id", cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_probes: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-restricted.

    Candidate pairs come from SHARED PROBE buckets: each row belongs
    to its primary bucket plus the ``n_probes`` buckets across its
    lowest-margin planes, and both join sides carry the full probe
    set (symmetric multi-probe). Two near-identical vectors split by
    one low-margin plane meet in either's flip bucket; split by TWO
    planes, they meet when each flips one of them — symmetric probing
    covers the XOR of the two probe sets, not just their union. Still
    a shuffle on the bucket id, never an all-pairs cross join; the
    exact cosine re-rank runs only within buckets. Raising
    ``n_planes`` shrinks buckets (cheaper, lower recall);
    ``n_probes`` buys recall back at ~(1+n_probes)× shuffle volume.
    """
    probed = df.select(
        "vec_id",
        F.col(vec_col).alias("__emb"),
        F.explode(probe_buckets(vec_col, n_planes, dim, n_probes)).alias("__bucket"),
    )
    lhs = probed.select(
        F.col("vec_id").alias("vec_a"), F.col("__emb").alias("emb_a"), "__bucket"
    )
    rhs = probed.select(
        F.col("vec_id").alias("vec_b"), F.col("__emb").alias("emb_b"), "__bucket"
    )
    cand = lhs.join(rhs, "__bucket").where(F.col("vec_a") != F.col("vec_b"))
    # normalize orientation, then dedup pairs found via several probes
    # in ONE shuffle (first() per pair key — no re-join for embeddings)
    norm = cand.select(
        F.least("vec_a", "vec_b").alias("pa"),
        F.greatest("vec_a", "vec_b").alias("pb"),
        F.when(F.col("vec_a") < F.col("vec_b"), F.col("emb_a"))
        .otherwise(F.col("emb_b"))
        .alias("ea"),
        F.when(F.col("vec_a") < F.col("vec_b"), F.col("emb_b"))
        .otherwise(F.col("emb_a"))
        .alias("eb"),
    )
    uniq = norm.groupBy("pa", "pb").agg(
        F.first("ea").alias("ea"), F.first("eb").alias("eb")
    )
    cos = cosine(F.col("ea"), F.col("eb"))
    return (
        uniq.select(
            F.col("pa").alias("vec_a"),
            F.col("pb").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
