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


def grouped_topk_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    payload_cols: Sequence[str] | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Per-group top-k with BOUNDED buffers — the hot-key-safe
    alternative to `topk_per_group`'s window form. A window ranks by
    sorting EVERY row of a group in one task: a group with 10^9 rows
    is a straggler (or an OOM) no matter how many executors exist.
    This form never materializes a group:

      phase 1 — groupBy(keys, spark_partition_id): each task folds
        ONLY its local slice of each group into a k-slice of a sorted
        array (buffer ≤ min(partition rows, k after slice));
      phase 2 — groupBy(keys): flatten the per-partition k-slices
        (≤ k × n_partitions rows per group — independent of group
        size) and slice to the final k.

    Both phases are ordinary partial-combining aggregates; the hot
    key degrades into aggregation work across partitions instead of
    a single-reducer sort. Ties break by the payload struct's own
    ordering after the order column, so results are deterministic.
    Returns one row per kept input row: keys + order_col + payload.

    NULL order values are FILTERED OUT up front: ``array_sort`` places
    NULL-first structs at one end and ``reverse`` would promote them
    to the TOP of the descending ranking, whereas the window form this
    replaces (``row_number ORDER BY x DESC``) puts NULLs last. Top-k
    by a NULL rank is meaningless, so the bounded form defines the
    ranking over non-null order values only; a group with fewer than
    k non-null rows returns just those rows.
    """
    df = df.where(F.col(order_col).isNotNull())
    payload_cols = list(
        payload_cols
        if payload_cols is not None
        else [c for c in df.columns if c not in keys and c != order_col]
    )
    srt = F.struct(F.col(order_col).alias("__o"), *[F.col(c) for c in payload_cols])
    direction = F.asc if ascending else F.desc

    def slice_topk(arr):
        srt_arr = F.array_sort(arr)
        if not ascending:
            srt_arr = F.reverse(srt_arr)
        return F.slice(srt_arr, 1, k)

    local = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(*keys, "__pid")
        .agg(slice_topk(F.collect_list(srt)).alias("__top"))
    )
    final = (
        local.groupBy(*keys)
        .agg(slice_topk(F.flatten(F.collect_list("__top"))).alias("__top"))
        .select(*keys, F.explode("__top").alias("__r"))
        .select(
            *keys,
            F.col("__r.__o").alias(order_col),
            *[F.col(f"__r.{c}").alias(c) for c in payload_cols],
        )
    )
    return final.orderBy(*keys, direction(order_col))
