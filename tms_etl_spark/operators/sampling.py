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


def epoch_shuffle(
    df: DataFrame, id_col: str, epochs: list[int]
) -> DataFrame:
    """Reproducible per-epoch global shuffle: each (epoch, row) gets
    ``shuffle_key = md5(id:epoch)`` and ``position = row_number()``
    over that key within the epoch — an independent, deterministic
    permutation per epoch with zero RNG state to checkpoint. Restarting
    a crashed epoch re-derives the identical order from the data alone.

    Plan: the epoch list (tiny) cross-joins onto the corpus as a
    broadcast-nested-loop fan-out (map-only), then ONE sort exchange
    per output partition: Spark range-partitions the per-epoch sort,
    so a 100 TB epoch is ordered across executors without any single
    task holding it. The md5 tie space is 2^128 so `id` ordering is a
    formality for exact-duplicate ids only.
    """
    spark = df.sparkSession
    ep = spark.createDataFrame([(int(e),) for e in epochs], ["epoch"])
    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col("epoch").cast("string"))
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", id_col)
    return (
        df.select(id_col)
        .crossJoin(F.broadcast(ep))
        .withColumn("shuffle_key", key)
        .select(
            "epoch",
            id_col,
            F.row_number().over(w).cast("long").alias("position"),
        )
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement: each row
    draws ``priority = u(id) / weight`` (``u`` the md5-uniform above)
    and the ``k`` smallest priorities win — heavier rows draw
    stochastically smaller priorities, so inclusion probability grows
    with weight, and the whole draw replays bit-identically from the
    ids. A deterministic cousin of the A-ES exponential-key sampler
    (Efraimidis & Spirakis 2006) with the monotone key u/w in place
    of -ln(u)/w, which keeps the key a single IEEE division both
    engines compute identically (no libm in the comparison path).

    Plan: map-only key computation + TakeOrdered(k) — no global sort,
    no shuffle of the corpus; the driver holds only k rows.
    """
    pr = _uniform(id_col) / F.col(weight_col).cast("double")
    return (
        df.select(id_col, weight_col, pr.alias("__priority"))
        .orderBy("__priority", id_col)
        .limit(k)
        .select(id_col, weight_col)
    )


def per_group_sample(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample: within each group, keep the
    ``k`` rows with the smallest md5-uniform draw — a reproducible
    stand-in for per-group reservoir sampling (same marginal
    behavior: each group member equally likely, exactly min(k, n)
    survivors per group) with no RNG state. One window exchange on
    the group key; at 100 TB that single shuffle is the floor for any
    exact per-group-k guarantee (sampleBy's Bernoulli rates only hit
    k in expectation)."""
    w = Window.partitionBy(group_col).orderBy(
        _uniform(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def winsorize_normalize(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group robust feature scaling: exact [p_lo, p_hi] cutoffs by
    the same min-value-with-cume_dist>=p rule the quantile filter
    uses, values clipped into the band (winsorized), then min-max
    normalized to [0,1] over the band — the outlier-immune feature
    prep step before training. ``norm`` is ONE IEEE division of
    exact integer-valued doubles, so it is engine-exact; degenerate
    bands (lo == hi) normalize to 0.0.

    Plan: one window exchange on the group key for the two cutoffs
    (both ranks share it), collapsed to a #groups-row table that
    broadcasts back over a map-only second pass."""
    w = Window.partitionBy(group_col).orderBy(metric_col)
    cd = F.cume_dist().over(w)
    cuts = (
        df.withColumn("__cd", cd)
        .groupBy(group_col)
        .agg(
            F.min(F.when(F.col("__cd") >= p_lo, F.col(metric_col))).alias("lo"),
            F.min(F.when(F.col("__cd") >= p_hi, F.col(metric_col))).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col(metric_col), F.col("lo")), F.col("hi"))
    norm = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        (clipped.cast("double") - F.col("lo").cast("double"))
        / (F.col("hi").cast("double") - F.col("lo").cast("double"))
    )
    return df.join(F.broadcast(cuts), group_col).select(
        id_col,
        group_col,
        metric_col,
        "lo",
        "hi",
        clipped.alias("clipped"),
        norm.alias("norm"),
    )
