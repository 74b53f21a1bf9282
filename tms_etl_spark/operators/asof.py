"""As-of join (SURVEY.md J8) — Spark lacks a native one.

Implemented as the union+window trick: tag left/right rows, union,
sort within each key partition by event time, and carry the latest
right-side value forward with ``last(..., ignorenulls=True)``. This
costs exactly ONE shuffle (by key) + one sort — the same cost as a
regular sort-merge join, and it scales linearly: no per-row probing,
no range explosion, no driver-side state. A pandas ``merge_asof`` via
``applyInPandas`` would pay Arrow serialization and per-group python;
the window form stays entirely in Tungsten codegen.

Parity with pandas ``merge_asof``: ``direction`` selects the latest
earlier right row ("backward", the default) or the earliest later one
("forward" — the same window over a reversed sort order), and
``tolerance`` nulls the payload when the matched row is further than
the given interval from the left timestamp. Both knobs compile into
the same single-shuffle plan.
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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row per ``on`` key:
    the latest with ``right.ts <= left.ts`` (``direction="backward"``)
    or the earliest with ``right.ts >= left.ts`` (``"forward"``).

    ``right_cols`` are the right-side payload columns to carry
    (renamed with ``suffix``). Left columns pass through unchanged.
    At equal timestamps the right row is visible to the left row
    (<= / >= semantics), enforced by sorting right-side rows first at
    ties. ``tolerance`` (e.g. ``"2 hours"``) nulls the carried
    payload when |left.ts − matched.ts| exceeds the interval —
    matches pandas ``merge_asof(tolerance=...)``.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, ts, right_cols, suffix, tolerance
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    payload = [f"{c}{suffix}" for c in right_cols]

    lt = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    lt = lt.withColumn("__rts", F.lit(None).cast(left.schema[ts].dataType))
    rt = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias("__rts"),
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # right rows (__side=0) sort before left rows at equal ts → the
    # equal-timestamp right row is already visible (<= / >= semantics)
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in [*payload, "__rts"]:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = unioned.where(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        gap = (
            F.col(ts) - F.col("__rts")
            if direction == "backward"
            else F.col("__rts") - F.col(ts)
        )
        ok = F.col("__rts").isNotNull() & (
            gap <= F.expr(f"INTERVAL {tolerance}")
        )
        for c in payload:
            out = out.withColumn(c, F.when(ok, F.col(c)))
    return out.drop("__rts")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str,
    tolerance: str | None,
) -> DataFrame:
    """``direction="nearest"``: the closer of the backward and forward
    matches (ties → backward, pandas parity). Both directions come
    out of ONE key-partitioned sort: the backward candidate is
    ``last(payload, ignorenulls)`` over (unboundedPreceding, 0) and
    the forward candidate ``first(...)`` over (0, unboundedFollowing)
    on the SAME ascending order — still exactly one shuffle, the same
    cost as a single-direction as-of."""
    on = list(on)
    payload = [f"{c}{suffix}" for c in right_cols]

    lt = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(
            f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType)
        )
    lt = lt.withColumn("__rts", F.lit(None).cast(left.schema[ts].dataType))
    rt = right.select(
        *on,
        F.col(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias("__rts"),
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(*lt.columns))

    # one ascending sort serves both directions; right rows sort
    # before left at equal ts so <=/>= ties resolve to the right row
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in [*payload, "__rts"]:
        unioned = unioned.withColumn(
            f"__b_{c}", F.last(c, ignorenulls=True).over(wb)
        ).withColumn(f"__f_{c}", F.first(c, ignorenulls=True).over(wf))

    out = unioned.where(F.col("__side") == 1).drop("__side")
    bgap = F.col(ts) - F.col("__b___rts")
    fgap = F.col("__f___rts") - F.col(ts)
    use_b = F.col("__b___rts").isNotNull() & (
        F.col("__f___rts").isNull() | (bgap <= fgap)
    )
    pick = {c: F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            for c in [*payload, "__rts"]}
    for c, expr in pick.items():
        out = out.withColumn(c, expr)
    if tolerance is not None:
        gap = F.abs(F.col(ts) - F.col("__rts"))
        ok = F.col("__rts").isNotNull() & (
            gap <= F.expr(f"INTERVAL {tolerance}")
        )
        for c in payload:
            out = out.withColumn(c, F.when(ok, F.col(c)))
    drop = [f"__b_{c}" for c in [*payload, "__rts"]] + [
        f"__f_{c}" for c in [*payload, "__rts"]
    ]
    return out.drop("__rts", *drop)
