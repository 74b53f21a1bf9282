"""As-of join (SURVEY.md J8) — Spark lacks a native one.

Implemented as the union+window trick: tag left/right rows, union,
sort within each key partition by event time, and carry the latest
right-side value forward with ``last(..., ignorenulls=True)``. This
costs exactly ONE shuffle (by key) + one sort — the same cost as a
regular sort-merge join, and it scales linearly: no per-row probing,
no range explosion, no driver-side state. A pandas ``merge_asof`` via
``applyInPandas`` would pay Arrow serialization and per-group python;
the window form stays entirely in Tungsten codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts``, per ``on`` key.

    ``right_cols`` are the right-side payload columns to carry
    (renamed with ``suffix``). Left columns pass through unchanged.
    At equal timestamps the right row is considered visible to the
    left row (<= semantics), enforced by sorting right-side rows
    first at ties.
    """
    on = list(on)
    payload = [f"{c}{suffix}" for c in right_cols]

    lt = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # right rows (__side=0) sort before left rows at equal ts → <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.where(F.col("__side") == 1).drop("__side")
