"""Corpus composition operators: deterministic mixture sampling
(hit a target domain/language mix under a document budget) and exact
per-group quantile thresholds (the "keep the top 75% by quality
score, per language" filter).

Reference analog: none (north-star training-data surface). Both
operators are pure built-in expressions; the only joins are
broadcasts of group-cardinality tables (languages, domains — never
corpus-sized), so at 100 TB the corpus side is map-only.

Determinism: sampling uses the md5-uniform trick from
``storage.hash_split`` (first 8 hex chars of md5(id) / 2^32-1) — a
document's keep/drop decision is a pure function of its id and the
rate table, reproducible on any engine; the quantile is the explicit
``min value with cume_dist >= p`` rule rather than an engine
``percentile_disc`` whose tie-breaking/interpolation conventions
differ between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _uniform(id_col: str):
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(0xFFFFFFFF))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget: int,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-class sampling rates that hit a target mixture: class ``c``
    gets rate ``min(1, budget * weights[c] / count(c))`` (clamped —
    you cannot upsample without replacement), and each row an
    order-independent keep decision ``u(id) < rate``.

    Output: every input row with its class, rate and ``sampled``
    flag (emitting the flag instead of filtering keeps the operator
    composable and the gate non-vacuous on both sides of the cut).

    Plan: one map-side-combined count per class (output is
    #classes rows), broadcast back; the corpus never shuffles.
    """
    counts = df.groupBy(class_col).agg(F.count("*").cast("long").alias("__n"))
    w = F.lit(0.0)
    for cls, frac in sorted(weights.items()):
        w = F.when(F.col(class_col) == cls, F.lit(float(frac))).otherwise(w)
    rates = counts.withColumn(
        "rate", F.least(F.lit(1.0), F.lit(float(budget)) * w / F.col("__n"))
    )
    return (
        df.join(F.broadcast(rates), class_col)
        .select(
            id_col,
            class_col,
            "rate",
            (_uniform(id_col) < F.col("rate")).alias("sampled"),
        )
    )


def quantile_threshold_filter(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    p: float = 0.25,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group exact quantile cutoff: the smallest ``metric`` value
    whose cumulative distribution within the group reaches ``p``
    (ties included, SQL-standard cume_dist), then every row flagged
    ``kept = metric >= cutoff`` — i.e. drop the bottom ``p`` of each
    group by the metric.

    Plan: one window exchange on the group key to rank the metric,
    collapsed to a #groups-row cutoff table that broadcasts back —
    the second pass over the corpus is map-only. cume_dist is exact
    integer-ratio arithmetic, so the cutoff is engine-exact (no
    percentile interpolation conventions involved).
    """
    w = Window.partitionBy(group_col).orderBy(metric_col)
    cuts = (
        df.withColumn("__cd", F.cume_dist().over(w))
        .where(F.col("__cd") >= p)
        .groupBy(group_col)
        .agg(F.min(metric_col).alias("cutoff"))
    )
    return df.join(F.broadcast(cuts), group_col).select(
        id_col,
        group_col,
        metric_col,
        "cutoff",
        (F.col(metric_col) >= F.col("cutoff")).alias("kept"),
    )
