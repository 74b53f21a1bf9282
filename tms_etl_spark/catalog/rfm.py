"""Customer-value analytics: RFM (recency/frequency/monetary)
quintile segmentation and funnel time-to-convert statistics — the
marketing-side consumers of the event stream, beside the behavioral
family (``catalog/behavior.py``).

Quintile discipline (the 100 TB part): scores never come from a
global ``ntile`` — that is a one-reducer sort over every user.
Instead each metric is collapsed to a bounded value-grain histogram
(recency ≤ span days; frequency small integers; monetary scored at
whole-currency grain), quintile thresholds are read off the
histogram's cumulative counts with INTEGER arithmetic
(``5·cum ≥ k·n`` — no division, no interpolation), and users score
against the 1-row broadcast threshold table map-side. Same family as
the histogram-based group quantiles in ``operators/sampling.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.quantiles import (
    histogram_quantile_thresholds,
    score_against_thresholds,
    sql_histogram_thresholds,
    sql_score,
)
from tms_etl_spark.sources.tables import load_table


def _qcol(x: str, t: str) -> F.Column:
    """quintile(x) = 1 + Σ_k [x > t_k] (integer-exact)."""
    return score_against_thresholds(x, t, 5)


def _sql_q(x: str, t: str) -> str:
    return sql_score(x, t, 5)


def _sql_thresholds(src: str, v: str) -> str:
    """Histogram-cume thresholds t1..t4 for metric ``v`` of ``src``."""
    return sql_histogram_thresholds(src, v, 5)


_RFM_SEGMENT_SQL = """
    CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
         WHEN f >= 4 THEN 'loyal'
         WHEN m >= 4 THEN 'big_spender'
         WHEN r <= 2 AND f >= 3 THEN 'at_risk'
         WHEN r <= 2 THEN 'hibernating'
         ELSE 'regular' END
"""


@query(
    "rfm_segmentation",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               CAST(date_diff('day',
                    CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP),
                    (SELECT CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP)
                     FROM events)) AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(FLOOR(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,4)) END), 0))
                    AS BIGINT) AS monetary
        FROM events GROUP BY user_id
    ),
    tr AS ({_sql_thresholds('base', 'recency_days')}),
    tf AS ({_sql_thresholds('base', 'frequency')}),
    tm AS ({_sql_thresholds('base', 'monetary')}),
    scored AS (
        SELECT b.user_id, b.recency_days, b.frequency, b.monetary,
               CAST(6 - {_sql_q('b.recency_days', 'tr.t')}
                    AS INTEGER) AS r,
               {_sql_q('b.frequency', 'tf.t')} AS f,
               {_sql_q('b.monetary', 'tm.t')} AS m
        FROM base b CROSS JOIN tr CROSS JOIN tf CROSS JOIN tm
    )
    SELECT user_id, recency_days, frequency, monetary, r, f, m,
           {_RFM_SEGMENT_SQL} AS segment
    FROM scored
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: per-user recency (days since last
    event, quintile inverted so 5 = most recent), frequency (event
    count) and monetary (whole-currency floor of the decimal-exact
    purchase sum), each scored 1–5 against histogram-derived
    thresholds, plus a rule-based segment label.

    Plan: ONE user-key exchange builds the per-user base; each
    metric's histogram partial-aggregates onto its bounded value
    grain; the three 1-row threshold tables broadcast back, so
    scoring is map-side. Integer threshold logic (5·cum ≥ k·n)
    makes every score exact cross-engine — no ntile, no
    interpolation, no division."""
    ev = load_table(spark, sf_dir, "events")
    day0 = ev.agg(
        F.date_trunc("day", F.max("ts")).alias("day0")
    )
    base = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.max("ts")).alias("last_day"),
            F.count("*").cast("long").alias("frequency"),
            F.floor(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("event_type") == "purchase",
                            F.col("value").cast("decimal(18,4)"),
                        )
                    ),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(day0))
        .select(
            "user_id",
            F.datediff(F.col("day0"), F.col("last_day"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )

    # Thresholds via the shared bucketed-histogram engine
    # (`operators/quantiles.py`): distinct `monetary` values can
    # approach user cardinality at scale, so no unpartitioned window
    # ever runs over the value-grain histogram — only over the
    # ≤256-row bucket-count table.
    tr = histogram_quantile_thresholds(base, "recency_days", 5, prefix="tr")
    tf = histogram_quantile_thresholds(base, "frequency", 5, prefix="tf")
    tm = histogram_quantile_thresholds(base, "monetary", 5, prefix="tm")
    scored = (
        base.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tf))
        .crossJoin(F.broadcast(tm))
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            (F.lit(6) - _qcol("recency_days", "tr")).cast("int").alias("r"),
            _qcol("frequency", "tf").alias("f"),
            _qcol("monetary", "tm").alias("m"),
        )
    )
    return scored.withColumn("segment", F.expr(_RFM_SEGMENT_SQL))


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH f AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                 AS t_purchase
        FROM events GROUP BY user_id
    ), d AS (
        SELECT CAST(date_diff('microseconds', t_signup, t_purchase)
                    AS BIGINT) AS us
        FROM f
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase > t_signup
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(us) AS BIGINT) AS min_us,
           CAST(MAX(us) AS BIGINT) AS max_us,
           quantile_cont(us, 0.5) AS median_us,
           CAST(SUM(CAST(us AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*)
             AS mean_us
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-lag distribution: count, min/max,
    exact median (interpolated halves of integer micros — dyadic,
    engine-exact) and decimal-exact mean. ONE user-key aggregation
    computes both step times. The median comes from the bucketed
    histogram engine (`operators/quantiles.py:histogram_median`),
    not ``percentile()``: the converted-user population is
    corpus-sized and percentile buffers every value in one
    aggregation buffer — worth the second pass over the lag column
    at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    d = f.where(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        (
            F.unix_micros("t_purchase") - F.unix_micros("t_signup")
        ).alias("us")
    )
    from tms_etl_spark.operators.quantiles import histogram_median

    stats = d.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
        (
            F.sum(F.col("us").cast("decimal(28,0)")).cast("double")
            / F.count("*")
        ).alias("mean_us"),
    )
    med = histogram_median(d, "us")
    return stats.crossJoin(F.broadcast(med)).select(
        "n_converted",
        "min_us",
        "max_us",
        F.col("median").alias("median_us"),
        "mean_us",
    )
