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


def temperature_sample(
    df: DataFrame,
    budget: int,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixture sampling at alpha = 0.5: class
    shares proportional to sqrt(count) instead of count — the
    multilingual-corpus trick (cf. XLM-R) that upweights rare
    languages without an explicit weight table. ``mixture_sample``
    takes the mix as an input; this derives it from the data.

    alpha is FIXED at 0.5 because sqrt is the one power IEEE-754
    requires to be correctly rounded — Spark and DuckDB agree
    bit-for-bit, where a general ``pow(n, alpha)`` may differ in the
    last ulp and flip a keep decision. The share denominator sums the
    per-class sqrt through DECIMAL (exact, order-independent), so
    every rate is a deterministic function of the class counts.

    Plan: one map-side-combined count per class (#classes rows), a
    1-row exact-decimal total, both broadcast back; the corpus is
    map-only — same shape as ``mixture_sample``.
    """
    counts = df.groupBy(class_col).agg(
        F.count("*").cast("long").alias("__n")
    )
    # scale 8: sqrt(n) x 10^8 stays under 2^53 for any real corpus
    # (n up to ~8e15 rows), keeping the decimal->double cast a single
    # correctly-rounded conversion in both engines
    sq = F.sqrt(F.col("__n").cast("double")).cast("decimal(28,8)")
    total = counts.agg(F.sum(sq).cast("double").alias("__s"))
    rates = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", sq.cast("double") / F.col("__s"))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.col("share") / F.col("__n"),
            ),
        )
        .select(class_col, "share", "rate")
    )
    return df.join(F.broadcast(rates), class_col).select(
        id_col,
        class_col,
        "share",
        "rate",
        (_uniform(id_col) < F.col("rate")).alias("sampled"),
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

    Plan: exact group quantiles WITHOUT ranking raw rows by group — a
    ``cume_dist OVER (PARTITION BY group)`` window funnels each whole
    group through one reducer, which dies at 100 TB when groups are
    few (5 languages!). Instead the cutoffs come from the value
    histogram: one map-side-combined count per (group, value) — tiny
    output for any discrete metric — then cume_dist arithmetic runs
    on the histogram itself (cumulative count / group total, exact
    integer ratios, identical to row-level cume_dist by definition).
    The #groups-row cutoff table broadcasts back; the corpus is never
    shuffled by the group key at all.
    """
    cuts = _histogram_cutoffs(df, metric_col, group_col, [("cutoff", p)])
    return df.join(F.broadcast(cuts), group_col).select(
        id_col,
        group_col,
        metric_col,
        "cutoff",
        (F.col(metric_col) >= F.col("cutoff")).alias("kept"),
    )


def _histogram_cutoffs(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    probes: list[tuple[str, float]],
) -> DataFrame:
    """Exact per-group quantile cutoffs from the (group, value) count
    histogram: for each ``(alias, p)`` probe, the smallest value whose
    cumulative row fraction reaches ``p`` — exactly the SQL
    ``MIN(value) WHERE cume_dist >= p`` rule, computed on the
    histogram (cume_dist(v) = #rows with metric <= v / #rows, which
    is cumulative histogram count over group total).

    The only shuffle of corpus-sized data is the map-side-combined
    histogram aggregation keyed by (group, value) — balanced however
    few groups there are; everything after runs on the histogram.
    """
    hist = df.groupBy(group_col, metric_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(metric_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(group_col)
    cd = (F.sum("__n").over(w_cum) / F.sum("__n").over(w_tot)).alias("__cd")
    with_cd = hist.select(group_col, metric_col, cd)
    return with_cd.groupBy(group_col).agg(
        *[
            F.min(F.when(F.col("__cd") >= p, F.col(metric_col))).alias(alias)
            for alias, p in probes
        ]
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, epochs: list[int], bucket_hex: int = 2
) -> DataFrame:
    """Reproducible per-epoch global shuffle: each (epoch, row) gets
    ``shuffle_key = md5(id:epoch)`` and ``position`` = its global rank
    on that key within the epoch — an independent, deterministic
    permutation per epoch with zero RNG state to checkpoint.
    Restarting a crashed epoch re-derives the identical order from
    the data alone.

    A naive ``row_number() OVER (PARTITION BY epoch)`` funnels each
    whole epoch through ONE reducer — dead at 100 TB. Instead the
    global rank is computed bucketed: the first ``bucket_hex`` hex
    chars of the key split each epoch into 16^bucket_hex
    uniformly-loaded buckets; per-bucket local ranks run in parallel,
    and each bucket's starting offset is the cumulative count of the
    smaller buckets — a (epochs × buckets)-row aggregate that
    broadcasts back. Identical output to the single-reducer form
    (md5 is uniform, the bucket prefix IS the key's leading bytes, so
    bucket order == key order), but the widest window partition is
    1/256th (default) of an epoch, and the bucket count is a knob.

    Plan: broadcast fan-out of the epoch list (map-only), one
    map-side-combined count per (epoch, bucket), one window exchange
    on (epoch, bucket), one broadcast join for the offsets.
    """
    spark = df.sparkSession
    ep = spark.createDataFrame([(int(e),) for e in epochs], ["epoch"])
    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col("epoch").cast("string"))
    )
    keyed = (
        df.select(id_col)
        .crossJoin(F.broadcast(ep))
        .withColumn("shuffle_key", key)
        .withColumn("bucket", F.substring("shuffle_key", 1, bucket_hex))
    )
    counts = keyed.groupBy("epoch", "bucket").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch",
        "bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_local = Window.partitionBy("epoch", "bucket").orderBy("shuffle_key", id_col)
    return (
        keyed.join(F.broadcast(offsets), ["epoch", "bucket"])
        .select(
            "epoch",
            id_col,
            (F.row_number().over(w_local) + F.col("__offset"))
            .cast("long")
            .alias("position"),
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
    df: DataFrame, group_col: str, id_col: str, k: int, n_salts: int = 64
) -> DataFrame:
    """Deterministic k-per-group sample: within each group, keep the
    ``k`` rows with the smallest md5-uniform draw — a reproducible
    stand-in for per-group reservoir sampling (same marginal
    behavior: each group member equally likely, exactly min(k, n)
    survivors per group) with no RNG state; sampleBy's Bernoulli
    rates only hit k in expectation.

    Low-cardinality groups (5 languages) make a plain per-group
    window one-reducer-per-group, so the exact top-k runs two-phase:
    rank within (group, salt) first — ``n_salts`` uniformly-loaded
    window partitions per group — keep each salt's k best (the global
    k best are necessarily among them), then the exact rank touches
    only ≤ n_salts·k candidate rows per group. Corpus-sized data
    shuffles once, on the salted key."""
    u = _uniform(id_col)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salts))
    )
    w_local = Window.partitionBy(group_col, "__salt").orderBy(
        u.asc(), F.col(id_col).asc()
    )
    candidates = (
        salted.withColumn("__lrk", F.row_number().over(w_local))
        .where(F.col("__lrk") <= k)
    )
    w_final = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        candidates.withColumn("__rk", F.row_number().over(w_final))
        .where(F.col("__rk") <= k)
        .drop("__rk", "__lrk", "__salt")
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

    Plan: both cutoffs come from one (group, value) histogram pass
    (see ``_histogram_cutoffs`` — no corpus-sized window partitioned
    by the low-cardinality group key), collapsed to a #groups-row
    table that broadcasts back over a map-only second pass."""
    cuts = _histogram_cutoffs(
        df, metric_col, group_col, [("lo", p_lo), ("hi", p_hi)]
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
