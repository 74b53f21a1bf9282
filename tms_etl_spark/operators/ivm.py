"""Incremental view maintenance for aggregate rollups.

Reference analog: the reference recomputes its per-month summaries
from scratch on every import (main_01.py's full-table SELECT +
re-insert loop); at 100 TB a materialized rollup must instead absorb
a delta batch in O(delta). The standard trick: store the rollup as
*partial aggregate states* (sum, count, min, max — all commutative
monoids), then maintenance is ``union(base_states, delta_states) →
re-aggregate by key`` and finalization (avg = sum/count) happens at
read time. This is exactly Spark's own partial/final HashAggregate
contract, lifted to table granularity — so the merged result is
bit-identical to a full recompute by construction (decimal-exact
sums are order-independent).

Deletes/updates ride the same path with negated contributions
(count = -1, sum = -x), the classic "delta stream" encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# State columns a rollup table carries per key. Extend as needed —
# any commutative-monoid state merges the same way.
_MERGE_RULES = {
    "cnt": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def aggregate_states(
    df: DataFrame, keys: list[str], value_col: str, dec: str = "decimal(18,4)"
) -> DataFrame:
    """Collapse raw rows to per-key partial states (one row per key):
    cnt, decimal-exact sum, min, max over ``value_col``."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast(dec)).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_states(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Absorb a delta-batch state table into the base rollup:
    union + one re-aggregation on the key. Cost is O(base keys +
    delta keys) — the raw history is never touched. Because every
    state is a commutative monoid and the sum is decimal-exact, the
    result is bit-identical to recomputing from all raw rows."""
    merged = base.unionByName(delta)
    return merged.groupBy(*keys).agg(
        *[rule(c).alias(c) for c, rule in _MERGE_RULES.items()]
    )


def finalize(states: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time finalization: expose the derived metrics (avg =
    sum/cnt as one IEEE division of exact operands)."""
    return states.select(
        *keys,
        F.col("cnt").cast("long").alias("n"),
        F.col("sum").cast("double").alias("total"),
        (F.col("sum").cast("double") / F.col("cnt")).alias("avg"),
        "min",
        "max",
    )


def join_view_delta(
    r_old: DataFrame,
    s_old: DataFrame,
    r_delta: DataFrame,
    s_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta rule for an inner-join view J = R ⋈ S under inserts:

        ΔJ = (ΔR ⋈ S_old)  ∪  (R_new ⋈ ΔS),   R_new = R_old ∪ ΔR

    Using R_new (not R_old) in the second term absorbs the ΔR⋈ΔS
    cross term, so the two joins partition the new pairs exactly —
    ``J_old ∪ ΔJ`` is the full recomputed join, row for row.

    The 100 TB argument: both joins have a DELTA on one side, so
    with a small batch they compile to broadcast joins and the cost
    is O(|Δ| + matched rows) — the history tables are probed, never
    re-joined against each other. Deletes ride the same algebra with
    negated delta streams (as in ``merge_states``).
    """
    r_new = r_old.unionByName(r_delta)
    return r_delta.join(s_old, on).unionByName(r_new.join(s_delta, on))


def retract_states(
    base: DataFrame, deleted: DataFrame, keys: list[str]
) -> DataFrame:
    """Apply a DELETE batch to a rollup by merging NEGATED delta
    states (cnt = -n, sum = -s) — the classic retractable-monoid
    encoding. Only the invertible states survive retraction (count,
    sum — and everything derived from them at read time: avg);
    min/max are NOT invertible under deletes and need a recompute or
    an auxiliary structure, which is why this path carries only the
    retractable columns. Keys whose count reaches zero disappear
    from the view, exactly as a recompute would drop them."""
    b = base.select(*keys, "cnt", "sum")
    neg = deleted.select(
        *keys,
        (-F.col("cnt")).alias("cnt"),
        (-F.col("sum")).alias("sum"),
    )
    merged = (
        b.unionByName(neg)
        .groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum").alias("sum"))
        .where(F.col("cnt") > 0)
    )
    return merged.select(
        *keys,
        F.col("cnt").cast("long").alias("n"),
        F.col("sum").cast("double").alias("total"),
        (F.col("sum").cast("double") / F.col("cnt")).alias("avg"),
    )
