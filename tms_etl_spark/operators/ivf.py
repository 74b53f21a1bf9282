"""IVF (inverted-file) approximate nearest neighbor over an
embedding column — the coarse-quantizer companion to the
random-hyperplane LSH in ``operators.similarity``.

Design (classic IVF-Flat, à la the FAISS paper "Billion-scale
similarity search with GPUs", Johnson et al. 2017 — public
literature, re-expressed on Spark):

1. pick ``n_cells`` coarse centroids from the corpus itself —
   DETERMINISTIC sampling (the k vectors with the smallest
   ``xxhash64(vec_id)``), not an RNG, so every run / cluster layout
   produces the same index;
2. optionally refine them with a few Lloyd iterations (means of
   assigned vectors — still deterministic);
3. assign every vector to its nearest centroid (its "cell"): one
   vectorized ``mapInPandas`` pass, centroid matrix shipped in the
   closure (n_cells × dim floats — a few KB, broadcast by value);
4. a query probes the ``n_probe`` cells whose centroids are nearest
   to it (computed driver-side in numpy — zero Spark jobs for the
   query side) and exact-reranks ONLY those cells' vectors.

Scale shape: the assignment is a single map pass (no shuffle); the
probe is a partition-prunable filter on ``cell`` when the corpus is
written partitioned/bucketed by cell — at 100 TB the index build is
one pass and each query touches n_probe/n_cells of the data.
``n_probe = n_cells`` degrades gracefully to exact brute force,
which the tests exploit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sample_centroids(
    df: DataFrame, n_cells: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic centroid seed: the ``n_cells`` vectors whose
    ``xxhash64(vec_id)`` is smallest — a uniform pseudo-random sample
    with no RNG state, reproducible anywhere. One bounded TakeOrdered
    (n_cells rows to the driver — the index metadata, not data)."""
    # hash the id column AS-IS (xxhash64 accepts any type): a cast to
    # long would NULL out non-numeric ids, collapsing every hash to
    # the same value and silently degrading the "uniform sample" to
    # an arbitrary id-order tie-break
    rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r["__v"]] for r in rows]


def refine_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    iterations: int = 2,
) -> list[list[float]]:
    """Lloyd refinement: assign → per-cell mean → new centroids.
    Deterministic given deterministic seeds. Each iteration is one
    assignment map pass + one groupBy(cell) average (posexplode to
    (cell, coord, value) then avg — all JVM built-ins); empty cells
    keep their previous centroid."""
    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = assign_cells(df, centroids, vec_col=vec_col)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ims"))
            .select("cell", F.col("ims.m").alias("mean"))
            .collect()
        )
        new = list(centroids)
        for r in means:
            vec = [float(x) for x in r["mean"]]
            if len(vec) == dim:
                new[r["cell"]] = vec
        centroids = new
    return centroids


def assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add a ``cell`` column = argmin_c ||v - centroid_c|| (equivalently
    argmax of cosine for unit-normalized centroids — we use true L2 on
    raw vectors, the standard IVF coarse quantizer). Vectorized
    mapInPandas: one Arrow batch → one matmul, no shuffle."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = [list(map(float, c)) for c in centroids]
    # fresh StructType — StructType.add would MUTATE df's cached
    # .schema and make the input frame appear to already have `cell`
    out_schema = StructType(
        list(df.schema.fields) + [StructField("cell", IntegerType())]
    )
    cols = df.columns

    def assign(batches):
        # self-contained closure (executors may lack repo on sys.path)
        import numpy as np

        cmat = np.asarray(cents)  # (k, dim)
        c2 = (cmat * cmat).sum(axis=1)  # ||c||² per centroid
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            # argmin ||v-c||² = argmin (||c||² - 2 v·c); ||v||² constant per row
            d = c2[None, :] - 2.0 * (mat @ cmat.T)
            pdf = pdf[cols].copy()
            pdf["cell"] = np.argmin(d, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, out_schema)


def query_cells(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The ``n_probe`` nearest cells to a literal query vector —
    plain-Python/numpy on the driver (index metadata is driver-side
    by construction); no Spark job."""
    import numpy as np

    q = np.asarray([float(x) for x in query_vec])
    cmat = np.asarray(centroids)
    d = ((cmat - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(centroids)), d))
    return [int(i) for i in order[: max(1, n_probe)]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """ANN top-k by cosine: restrict the exact scan to the query's
    ``n_probe`` nearest IVF cells. With ``n_probe == n_cells`` this
    is exactly brute force (the recall tests pin that identity).
    Pass ``centroids`` to reuse a prebuilt index across queries."""
    from tms_etl_spark.operators.similarity import cosine

    if centroids is None:
        centroids = sample_centroids(df, n_cells, vec_col=vec_col)
    probe = query_cells(query_vec, centroids, n_probe)
    assigned = assign_cells(df, centroids, vec_col=vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("cell").isin(probe))
        .select("vec_id", cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
