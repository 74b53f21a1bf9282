"""Window-function operators (SURVEY.md §2.5, O2).

All are single-shuffle patterns: one exchange on the partition key,
one sort, then a codegen'd window stage — the shape that survives a
100× scale-up as long as no single key dominates (for skewed keys,
pre-aggregate or salt before ranking).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """W1: newest row per key (reference: last-log-line / newest-file
    scan, /root/reference/src/main_01.py:1022-1037, :330).

    ``order`` must be a total order (include a unique tie-break) or
    the survivor is nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """O2: top-k rows per group (reference: top-2 recent months,
    /root/reference/src/main_02.py:226-232)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
