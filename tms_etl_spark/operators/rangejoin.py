"""Bucketized large-large range join (SURVEY.md J7 scale path).

A naive interval join (``l.ts BETWEEN r.lo AND r.hi``) is a
broadcast-nested-loop — fine when one side is tiny (see
catalog.joins.join_range_bands), quadratic when both sides are big.
The scale form buckets the range dimension: each interval lands in
every bucket it overlaps, each point in its own bucket, and the join
becomes an equi-join on bucket + a residual predicate. Shuffle keys
on the bucket, so cost is O(points + interval-replication), not
O(points × intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``bucket_width`` should be on the order of the typical interval
    length: too small replicates intervals across many buckets, too
    large degrades to per-bucket nested loops. All columns numeric
    (epoch seconds for time ranges).
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(
        iv,
        on=(
            (p["__bucket"] == iv["__bucket"])
            & (p[point_col] >= iv[lo_col])
            & (p[point_col] <= iv[hi_col])
        ),
        how=how,
    )
    return joined.drop("__bucket")
