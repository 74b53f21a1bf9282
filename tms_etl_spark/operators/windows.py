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


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    band_width: float = 100.0,
) -> DataFrame:
    """2D Pareto frontier (skyline): rows not strictly dominated by
    any other row, where lower ``x_col`` is better and higher
    ``y_col`` is better (a row dominates another if x <= and y >=
    with at least one strict).

    Monotone-sweep form, bucketed so NO global single-reducer window
    exists (the epoch_shuffle discipline): collapse to the x-grain
    (max y per distinct x), band x into fixed-width ranges, cummax y
    within each band in parallel, and resolve cross-band prefixes
    via a bands-sized cummax table that broadcasts back. A row is
    dominated iff the best y at any strictly-smaller x reaches its
    y, or a same-x row strictly beats its y. One x-grain shuffle +
    one broadcast; never a self-join.
    """
    x, y = F.col(x_col), F.col(y_col)
    grain = df.groupBy(x_col).agg(F.max(y_col).alias("__ymax"))
    banded = grain.withColumn(
        "__band", F.floor(x / F.lit(band_width)).cast("long")
    )
    in_band = Window.partitionBy("__band").orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = banded.withColumn("__prev_in_band", F.max("__ymax").over(in_band))
    band_tops = banded.groupBy("__band").agg(
        F.max("__ymax").alias("__band_max")
    )
    prev_bands = (
        Window.orderBy("__band").rowsBetween(Window.unboundedPreceding, -1)
    )
    # bands table is tiny (|x-range| / band_width rows) — the global
    # window over it is bounded metadata, not data
    band_prefix = band_tops.withColumn(
        "__prev_bands", F.max("__band_max").over(prev_bands)
    ).select("__band", "__prev_bands")
    thresh = (
        local.join(F.broadcast(band_prefix), "__band")
        .select(
            x_col,
            "__ymax",
            F.greatest(
                F.coalesce(F.col("__prev_in_band"), F.lit(float("-inf"))),
                F.coalesce(F.col("__prev_bands"), F.lit(float("-inf"))),
            ).alias("__best_cheaper_y"),
        )
    )
    joined = df.join(thresh, x_col)
    dominated = (F.col("__best_cheaper_y") >= y) | (F.col("__ymax") > y)
    return joined.where(~dominated).select(*df.columns)
