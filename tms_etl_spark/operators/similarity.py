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
    layouts, no RNG state to ship.

    The weights are evaluated DRIVER-SIDE (``plane_weights``, the
    pure-Python xxhash64 twin, bit-equality pinned in tests) and
    embedded as double literals: an n_planes×dim tree of
    ``xxhash64(lit, lit)`` nodes is constant-foldable anyway, but
    Catalyst spends seconds analyzing it — pre-folding cut ~5 s of
    planning time off every query that buckets vectors."""
    projs = []
    for plane in plane_weights(n_planes, dim):
        w = F.array(*[F.lit(wi) for wi in plane])
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
    max_bucket_rows: int = 4096,
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

    Within-bucket scoring is a vectorized ``applyInPandas``: one
    shuffle on the bucket id delivers each bucket's vectors to one
    task, which scores them as a BLAS matmul in row blocks (memory is
    O(block × bucket), never O(bucket²)) and emits only the pairs
    over the threshold. A per-pair expression join was measured ~8×
    slower here — Spark's higher-order functions are interpreted, so
    a 64-dim dot per candidate pair costs ~100 lambda evaluations
    where numpy does a fused matmul. The final groupBy dedups pairs
    found via several shared probe buckets and shuffles only
    (id, id, score) triples that already passed the threshold.

    Hot-bucket bound: one task scores a whole bucket, so a degenerate
    corpus (thousands of identical embeddings share every probe
    bucket) would be quadratic in both time and emitted pairs.
    Buckets wider than ``max_bucket_rows`` are star-capped, the same
    discipline as ``minhash_lsh_pairs``: the first ``max_bucket_rows``
    rows (deterministic vec_id order) all-pairs as usual, and every
    overflow row scores only against the bucket's representative
    (first row) — per-bucket work drops to O(cap² + (n−cap)·d) and
    pairs to C(cap,2) + (n−cap), both linear in bucket size past the
    cap, while every member stays connected through the
    representative. ``n_planes`` still controls typical bucket width
    (16 planes → 65k buckets); the cap is the adversarial backstop.
    """
    probed = df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__emb"),
        F.explode(probe_buckets(vec_col, n_planes, dim, n_probes)).alias("__bucket"),
    )
    thr = float(threshold)
    cap = int(max_bucket_rows)

    def score_bucket(pdf):
        # self-contained closure: executors may lack the repo on path
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": np.array([], dtype="int64"),
                "vec_b": np.array([], dtype="int64"),
                "cos_sim": np.array([], dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        # deterministic order so the capped head is the same set on
        # every run/partitioning
        pdf = pdf.sort_values("vec_id")
        mat = np.stack(pdf["__emb"].to_numpy())
        ids = pdf["vec_id"].to_numpy().astype("int64")
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cos defined as 0
        unit = mat / norms[:, None]
        out = [empty]
        block = 1024
        head = min(n, cap)
        for s in range(0, head, block):
            e = min(s + block, head)
            sims = unit[s:e] @ unit[:head].T  # (block, head)
            ia, ib = np.nonzero(sims >= thr)
            a_ids, b_ids = ids[s + ia], ids[ib]
            keep = a_ids < b_ids  # drops self-pairs and mirror dups
            out.append(
                pd.DataFrame(
                    {
                        "vec_a": a_ids[keep],
                        "vec_b": b_ids[keep],
                        "cos_sim": sims[ia[keep], ib[keep]],
                    }
                )
            )
        if n > cap:
            # star the overflow against the bucket representative:
            # linear work, keeps every member connected
            sims = unit[cap:] @ unit[0]  # (n-cap,)
            hit = np.nonzero(sims >= thr)[0]
            a_ids = np.minimum(ids[cap + hit], ids[0])
            b_ids = np.maximum(ids[cap + hit], ids[0])
            out.append(
                pd.DataFrame(
                    {"vec_a": a_ids, "vec_b": b_ids, "cos_sim": sims[hit]}
                )
            )
        return pd.concat(out, ignore_index=True)

    scored = probed.groupBy("__bucket").applyInPandas(
        score_bucket, "vec_a long, vec_b long, cos_sim double"
    )
    # a pair found via several shared probe buckets appears once per
    # such bucket — dedup on the pair key (tiny: post-threshold rows).
    # max, not first: per-bucket BLAS blocking can differ in the last
    # ulp for the same pair, and first() would make the emitted score
    # depend on bucket evaluation order.
    return scored.groupBy("vec_a", "vec_b").agg(
        F.max("cos_sim").alias("cos_sim")
    )
