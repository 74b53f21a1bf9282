"""Sequential funnel analysis over an event stream: for each user,
the earliest time each funnel step was reached IN ORDER (step i+1
counts only strictly after the user's step-i time).

Reference analog: none (the reference's pipeline has no sequence
analytics); this is north-star OLAP surface for the events table.

Plan shape: ONE exchange. Every step time is a ``MIN(CASE ...) OVER
(PARTITION BY user)`` window on the same partitioning, so Catalyst
plans a single hash exchange on the user key and evaluates all steps
in one pass over each partition; the final per-user collapse groups
by the same key, reusing that exchange (the winnow-digest trick —
pinned for that operator in tests/test_plans.py). State per user is
O(steps), never O(events): no self-joins, no per-pair comparisons —
at 100 TB the cost is one shuffle of the events table, which is the
floor for any per-user computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user: ``t_<step>`` timestamps (NULL once the funnel
    is abandoned), the furthest ``stage`` reached (0..len(steps)), and
    end-to-end conversion time in exact integer microseconds."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    for step in steps:
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        col = f"t_{step}"
        out = out.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    step_cols = [f"t_{s}" for s in steps]
    agg = out.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in step_cols]
    )
    # built forward so the final expression checks the DEEPEST step
    # first: when(t_last notnull, n) else when(t_prev notnull, n-1) ...
    stage = F.lit(0)
    for i, c in enumerate(step_cols):
        stage = F.when(F.col(c).isNotNull(), F.lit(i + 1)).otherwise(stage)
    return agg.select(
        user_col,
        *step_cols,
        stage.cast("int").alias("stage"),
        (
            F.unix_micros(F.col(step_cols[-1]))
            - F.unix_micros(F.col(step_cols[0]))
        ).alias("micros_to_convert"),
    )


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign every event a per-user session ordinal: a new session
    starts when the gap to the user's previous event exceeds
    ``gap_minutes`` (strictly). The classic lag-flag-cumsum rule —
    both windows share ONE ``PARTITION BY user`` exchange (the lag
    and the running sum use the same partitioning and ordering), so
    the cost at 100 TB is the single per-user shuffle that any
    sessionization needs. Unlike the windowed-aggregate form
    (``session_window`` in stream_windows), this keeps EVERY event
    row, labeled — the shape downstream per-session feature joins
    want."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    new_flag = (
        prev_ts.isNull()
        | (
            (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts))
            > gap_minutes * 60 * 1_000_000
        )
    ).cast("int")
    return df.select(
        user_col,
        id_col,
        ts_col,
        new_flag.alias("session_start"),
    ).withColumn(
        "session_seq",
        F.sum("session_start").over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
