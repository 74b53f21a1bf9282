"""Count-Min sketch as a DataFrame aggregation.

A CMS is d hash rows × w buckets of counters; update = increment one
counter per row, estimate = min over the d counters a key hashes to.
That makes it literally a ``groupBy(row, bucket).count()`` — so
instead of a driver-side sketch object (PySpark doesn't expose the
Scala ``stat.countMinSketch``, and a JVM object can't be merged
inside a query anyway), the sketch HERE is a (d × w)-row DataFrame:

- building it is one map-side-combined aggregation (the partial aggs
  per partition ARE the mergeable partial sketches — Spark's partial/
  final HashAggregate is exactly CMS merge, since CMS is linear);
- it persists/unions like any table (per-day sketches union+re-agg
  into a month sketch without rescanning raw data);
- estimating joins the probe keys against ≤ d·w rows (broadcast).

Hashing: ``xxhash64(key, row_index)`` — JVM-side, deterministic,
seeded by the row index, so the sketch is reproducible across runs
and engines that share xxhash64.

Guarantees (standard CMS, Cormode & Muthukrishnan 2005): estimates
never under-count, and over-count by ≤ e/w · N with probability
1 − (1/2)^d per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_cms(
    df: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """One pass over ``df`` → the sketch table (row, bucket, cnt).
    Size ≤ depth × width rows regardless of input cardinality."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(key_col).alias("__k"))
        .select("__k", rows)
        .select(
            "row",
            F.pmod(F.xxhash64("__k", "row"), F.lit(width)).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query the sketch for every row of ``probes``: hash the
    key into each sketch row, look the d counters up (broadcast join —
    the sketch is tiny), take the min. Output: probes + ``cms_est``."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    hashed = probes.select(
        F.col(key_col), rows
    ).select(
        key_col,
        "row",
        F.pmod(F.xxhash64(F.col(key_col), F.col("row")), F.lit(width)).alias(
            "bucket"
        ),
    )
    looked = hashed.join(F.broadcast(cms), ["row", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    est = looked.groupBy(key_col).agg(F.min("cnt").alias("cms_est"))
    return probes.join(F.broadcast(est), key_col)
