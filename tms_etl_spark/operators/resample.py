"""Time-series resampling: regular buckets, gap materialization, and
forward fill — the operator family the reference's domain begs for
(a powered-off loom simply produces no rows for days; every
"efficiency over time" report needs the missing buckets to exist).

Scale shape:

- bucket assignment is a map-side ``date_trunc``-style expression;
- the bucket aggregate partial-aggregates before its shuffle;
- gap materialization generates each key's missing buckets from the
  key's OWN [min, max] span (``sequence`` + ``explode`` — rows are
  O(buckets), never a cross join against a global calendar);
- forward fill is one window per key ordered by bucket
  (``last(..., ignorenulls=True)``) — the same single-shuffle shape
  as the as-of join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Aggregate ``df`` into fixed ``step`` buckets (e.g. "1 hour")
    per key: (keys..., bucket_start, *aggs). Buckets with no rows are
    absent — pipe through :func:`fill_gaps` to materialize them."""
    bucket = F.window(F.col(ts_col), step)["start"].alias("bucket_start")
    return df.groupBy(*key_cols, bucket).agg(*aggs)


def fill_gaps(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    step: str,
    ffill_cols: Sequence[str] = (),
) -> DataFrame:
    """Materialize missing buckets per key over the key's own
    [min, max] bucket span, then forward-fill ``ffill_cols`` (other
    columns stay NULL in generated rows).

    The generated calendar is per-key (sequence over that key's span),
    so a key active for one day does not inflate to the table's full
    history — at 100 TB that difference is the whole ballgame.
    """
    keys = list(key_cols)
    spans = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    calendar = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )
    full = calendar.join(df, [*keys, bucket_col], "left")
    if ffill_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in ffill_cols:
            full = full.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return full
