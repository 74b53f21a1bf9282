"""SemDeDup-style semantic deduplication: IVF-cell clustering, then
within-cell cosine near-duplicate drops keeping the lowest-id
representative.

Public-method provenance: SemDeDup (Abbas et al. 2023, arXiv
2303.09540) prunes semantic duplicates inside k-means clusters of an
embedding space; this is the Spark-native form reusing the engine's
deterministic IVF coarse quantizer (`operators/ivf.py` —
hash-sampled centroids, no RNG state). Reference analog: the
reference's duplicate guard (/root/reference/src/main_01.py:520-536)
lifted from exact keys to semantic neighborhoods.

Scale shape: cell assignment is one map pass (mapInPandas matmul, no
shuffle); the drop decision shuffles ONCE on the cell id and does an
O(s^2) in-memory cosine per cell — s is bounded by sizing n_cells to
the corpus (SemDeDup's own regime: tens of thousands of clusters at
web scale keeps s in the thousands). Never an all-pairs join across
cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def semdedup_flags(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector semantic-dedup verdicts: (id, cell, dropped,
    dup_of). ``dropped`` is true iff a SAME-CELL vector with a
    smaller id has cosine >= tau; ``dup_of`` is the smallest such id
    (the greedy-by-id representative rule — deterministic, no RNG).

    One applyInPandas per cell: vectors are unit-normalized and a
    single BLAS gram matrix gives every within-cell cosine; the
    strictly-lower-triangular threshold mask makes the verdict an
    any()/argmax() per row. Rows are sorted by id inside the group so
    the mask semantics (and BLAS reduction order) are
    partition-independent."""
    from tms_etl_spark.operators.ivf import assign_cells

    assigned = assign_cells(df, centroids, vec_col)
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cell", IntegerType()),
            StructField("dropped", BooleanType()),
            StructField("dup_of", LongType()),
        ]
    )

    def per_cell(pdf):
        import numpy as np
        import pandas as pd

        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.stack(pdf[vec_col].to_numpy()[order]).astype("float64")
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        lower = np.tril(cos >= tau, k=-1)
        dropped = lower.any(axis=1)
        first = np.argmax(lower, axis=1)  # first True = smallest id
        dup_of = [
            int(ids[j]) if d else None for d, j in zip(dropped, first)
        ]
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": int(pdf["cell"].iloc[0]),
                "dropped": dropped,
                "dup_of": pd.array(dup_of, dtype="Int64"),
            }
        )

    return assigned.groupBy("cell").applyInPandas(per_cell, out_schema)


def semdedup_keep(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The deduplicated corpus: input rows whose verdict is KEEP.
    Join back on the id — the flags frame is (id, cell, verdict)
    metadata, far narrower than the payload, so at scale this is the
    cheap side of the join."""
    flags = semdedup_flags(df, centroids, tau, vec_col, id_col)
    keep = flags.where(~F.col("dropped")).select(id_col)
    return df.join(keep, id_col, "left_semi")
