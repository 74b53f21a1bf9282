"""Product quantization (PQ) for embedding columns — the
memory-bound ANN scale path next to hyperplane LSH
(``operators/similarity``) and IVF-Flat (``operators/ivf``).

Design (classic PQ, Jégou/Douze/Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public literature,
re-expressed on Spark):

1. split the ``d``-dim embedding into ``m`` contiguous subspaces of
   ``d/m`` dims; learn a tiny codebook of ``ksub`` centroids PER
   subspace (deterministic xxhash-sampled seeds + Lloyd means, the
   ``operators/ivf`` discipline — no RNG, same index everywhere);
2. encode every vector as ``m`` small integers (argmin sub-centroid
   per subspace) — 8 bytes instead of 256 for d=64/m=8/float32, the
   32× compression that lets a 100-billion-vector index live in
   cluster RAM;
3. score queries WITHOUT decoding: the query builds an
   (m × ksub) lookup table of per-subspace partial dots driver-side,
   and each vector's approximate dot is the sum of ``m`` table
   lookups — asymmetric distance computation (ADC). Because the
   subspaces partition the coordinates, dot(q, reconstruction) ==
   Σ_j lut[j][code_j] EXACTLY, and ‖reconstruction‖² ==
   Σ_j ‖centroid_{j,code_j}‖² exactly, so ADC cosine here is the
   TRUE cosine between the query and the quantized reconstruction —
   the only approximation is the quantization itself.

Scale shape: training collects only index metadata (m·ksub·d/m
floats); encoding is one vectorized mapInPandas pass (no shuffle);
ADC scoring is a PURE JVM expression — ``zip_with`` of the code
array with a broadcast offset array through one literal lookup
array, then ``aggregate`` — inside whole-stage codegen, no Python on
the query path; top-k finishes as TakeOrderedAndProject."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 1,
) -> list[list[list[float]]]:
    """Learn ``m`` per-subspace codebooks of ``ksub`` centroids each;
    returns ``codebooks[j][c]`` = centroid ``c`` of subspace ``j``.

    Seeds: the sub-vectors of the ``ksub`` corpus vectors with the
    smallest ``xxhash64(id)`` (deterministic uniform sample, one
    bounded TakeOrdered). Refinement: ``lloyd_iters`` rounds of
    assign → per-(subspace, code, dim) mean — each round is one
    encode pass plus one partial-aggregating groupBy on the bounded
    (m · ksub · d/m) key grid; empty codes keep their centroid."""
    rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(ksub)
        .collect()
    )
    seeds = [[float(x) for x in r["__v"]] for r in rows]
    d = len(seeds[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    books = [
        [seeds[c % len(seeds)][j * ds : (j + 1) * ds] for c in range(ksub)]
        for j in range(m)
    ]
    for _ in range(lloyd_iters):
        enc = pq_encode(df, books, vec_col=vec_col, id_col=id_col)
        comp = df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "__p", "__x"
            ),
        ).select(
            "__id",
            (F.col("__p") / ds).cast("int").alias("__j"),
            (F.col("__p") % ds).alias("__dim"),
            "__x",
        )
        codes = enc.select(
            F.col(id_col).alias("__id"),
            F.posexplode("codes").alias("__j", "__code"),
        )
        means = (
            comp.join(codes, ["__id", "__j"])
            .groupBy("__j", "__code", "__dim")
            .agg(F.avg("__x").alias("__mean"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in means:
            new[r["__j"]][r["__code"]][r["__dim"]] = float(r["__mean"])
        books = new
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) — ``codes[j]`` = argmin_c ‖subvec_j − book_j[c]‖.
    One vectorized mapInPandas pass (an argmin per subspace over a
    (batch × ksub) distance matrix); the codebooks travel in the
    closure (index metadata, a few KB). Ties break to the lowest
    code (numpy argmin), deterministically."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    books = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(books)
    ds = len(books[0][0])
    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field, StructField("codes", ArrayType(IntegerType()))]
    )

    def encode(batches):
        import numpy as np

        mats = [np.asarray(b) for b in books]  # m × (ksub, ds)
        c2s = [(bm * bm).sum(axis=1) for bm in mats]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            out_codes = np.empty((len(pdf), m), dtype="int32")
            for j in range(m):
                sub = mat[:, j * ds : (j + 1) * ds]
                dist = c2s[j][None, :] - 2.0 * (sub @ mats[j].T)
                out_codes[:, j] = np.argmin(dist, axis=1)
            yield __import__("pandas").DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(out_codes),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(encode, out_schema)


def adc_cosine(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """Add ``adc_cos`` = cosine(query, quantized reconstruction) to an
    encoded frame — pure JVM expression, zero Python on the query
    path. Driver precomputes two flat (m·ksub) tables: partial dots
    lut[j·ksub + c] = q_j · book_j[c] and partial squared norms;
    per row the dot and ‖recon‖² are each ONE zip_with + aggregate
    over the m-element code array (whole-stage codegen)."""
    import math

    m = len(codebooks)
    ksub = len(codebooks[0])
    ds = len(codebooks[0][0])
    q = [float(x) for x in query_vec]
    lut_dot: list[float] = []
    lut_n2: list[float] = []
    for j, book in enumerate(codebooks):
        qs = q[j * ds : (j + 1) * ds]
        for c in book:
            lut_dot.append(sum(a * b for a, b in zip(qs, c)))
            lut_n2.append(sum(a * a for a in c))
    qnorm = math.sqrt(sum(a * a for a in q))
    dot_lit = F.array(*[F.lit(v) for v in lut_dot])
    n2_lit = F.array(*[F.lit(v) for v in lut_n2])
    offs = F.array(*[F.lit(j * ksub) for j in range(m)])

    def lookup(table):
        return F.aggregate(
            F.zip_with(
                F.col("codes"),
                offs,
                lambda c, o: F.element_at(table, o + c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return encoded.withColumn(
        "adc_cos",
        lookup(dot_lit) / (F.lit(qnorm) * F.sqrt(lookup(n2_lit))),
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ANN top-k by ADC cosine over the PQ codes. Pass ``codebooks``
    to reuse a prebuilt index (and in production, a persisted
    ``pq_encode`` output — the codes table is the 32×-smaller index
    one actually stores). Top-k is TakeOrdered with a vec_id
    tie-break: vectors sharing codes share scores exactly."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            df, m=m, ksub=ksub, vec_col=vec_col, id_col=id_col
        )
    enc = pq_encode(df, codebooks, vec_col=vec_col, id_col=id_col)
    return (
        adc_cosine(enc, query_vec, codebooks)
        .select(id_col, F.col("adc_cos").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
