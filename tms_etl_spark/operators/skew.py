"""Skew & co-location strategies (SURVEY.md §4 "Shuffle/partitioning
strategy") — the knobs that decide whether a 100 TB join finishes.

- ``salted_join``: explicit salting for a skewed build side when AQE's
  skew-join can't help (e.g. the skew is in a broadcast-ineligible
  aggregation upstream). The hot key's rows spread over ``salt``
  sub-keys; the small side replicates ``salt``×. Semantics identical
  to the plain join (asserted in tests).
- ``write_bucketed`` / co-located joins: pre-shuffle the table once at
  write time (bucketBy), so every later join/aggregation on the
  bucket key runs with NO exchange. The amortization argument at
  100 TB: one shuffle at ingest vs one per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot: salt the
    skewed side with a uniform random-ish sub-key derived from a
    stable row expression, replicate the small side across all salt
    values, and join on (key, salt). One shuffle either way — but the
    hot key now occupies ``salt`` reducers instead of one.
    """
    salted_l = skewed.withColumn(
        "__salt", (F.abs(F.xxhash64(*skewed.columns)) % salt).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)])).alias("__salt")
    salted_r = small.select("*", salts)
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist pre-shuffled: bucketBy(bucket_cols) so later joins and
    aggregations on those columns are exchange-free; sortBy makes
    merge joins sort-free too."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
