"""Attribution and robust time-series catalog entries over the
events stream: linear multi-touch attribution, trapezoidal
time-weighted averages, median/MAD anomaly flags, and seasonal-naive
forecast error — the monitoring/credit-assignment shapes a product
pipeline runs beside the behavioral family (``catalog/behavior.py``).

Exactness: epochs and counts are longs; doubles only flow through
IEEE add/multiply/divide on deterministic inputs; every aggregate of
doubles rides DECIMAL (``catalog/exact.py`` discipline); medians are
exact interpolations of integers (halves/quarters — dyadic, so both
engines agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table


@query(
    "attribution_linear",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, ts AS t_ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
        SELECT p.p_id, p.value, t.channel,
               CAST(COUNT(*) OVER (PARTITION BY p.p_id) AS BIGINT)
                 AS n_touch
        FROM p JOIN t ON t.user_id = p.user_id AND t.t_ts < p.p_ts
    )
    SELECT channel,
           CAST(ROUND(SUM(CAST(value / n_touch AS DECIMAL(28,8))), 4)
                AS DOUBLE) AS total_credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches_credited,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions
    FROM j GROUP BY channel
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click before a
    purchase by the same user shares that purchase's value equally;
    per-channel totals. Conversions with no prior touch attribute
    nothing (classic linear model).

    Plan: ONE user-keyed equi-join (time predicate as residual);
    the per-conversion touch count is a window on (user, purchase) —
    hash(user_id) already clusters those rows, so Catalyst inserts
    no second corpus exchange on the scale (shuffled-join) path
    (pinned in test_plans); the channel rollup is
    channels-sized. Per-user fan-out is purchases×touches of one
    user — the same bounded-activity shape as the funnel family.
    Credit = value / n (one IEEE division); totals ride
    DECIMAL(28,8) rounded to the money scale."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("channel")
    )
    j = p.join(t, "user_id").where(F.col("t_ts") < F.col("p_ts"))
    w = Window.partitionBy("user_id", "p_id")
    j = j.withColumn("n_touch", F.count("*").over(w).cast("long"))
    return j.groupBy("channel").agg(
        F.round(
            F.sum((F.col("value") / F.col("n_touch")).cast("decimal(28,8)")), 4
        )
        .cast("double")
        .alias("total_credit"),
        F.count("*").cast("long").alias("n_touches_credited"),
        F.countDistinct("p_id").cast("long").alias("n_conversions"),
    )


@query(
    "ts_time_weighted_avg",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id, ts, value
        FROM events WHERE event_type = 'view'
    ), seg AS (
        SELECT user_id, value,
               lead(value) OVER w AS v2,
               epoch_us(ts) AS us,
               lead(epoch_us(ts)) OVER w AS us2
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), terms AS (
        SELECT user_id,
               ((value + v2) / CAST(2.0 AS DOUBLE))
                 * ((us2 - us) / CAST(1000000.0 AS DOUBLE)) AS wv,
               (us2 - us) / CAST(1000000.0 AS DOUBLE) AS dt
        FROM seg WHERE us2 IS NOT NULL
    )
    SELECT user_id,
           CAST(ROUND(SUM(CAST(wv AS DECIMAL(28,8))), 2) AS DOUBLE)
             / CAST(ROUND(SUM(CAST(dt AS DECIMAL(28,8))), 2) AS DOUBLE)
             AS twa,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM terms
    GROUP BY user_id
    HAVING CAST(ROUND(SUM(CAST(dt AS DECIMAL(28,8))), 2) AS DOUBLE) > 0
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average of each user's 'view'
    values over irregular sample times — the correct mean for
    unevenly sampled series (a plain AVG over-weights bursts).

    Plan: ONE user-key exchange shared by the ordering window and
    the final per-user aggregation. Exactness: segment weight =
    (v_i + v_{i+1})/2 · Δt_seconds, all IEEE ops on exact inputs
    (Δt from integer epoch-micros); numerator/denominator sums ride
    DECIMAL(28,8) rounded at scale 2 (segment weights reach ~1e9, so
    scale 2 keeps sum×10^scale inside the 2^53 cast invariant);
    the final quotient is one double division."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = v.select(
        "user_id",
        "value",
        F.lead("value").over(w).alias("v2"),
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("us2"),
    ).where(F.col("us2").isNotNull())
    terms = seg.select(
        "user_id",
        (
            ((F.col("value") + F.col("v2")) / F.lit(2.0))
            * ((F.col("us2") - F.col("us")) / F.lit(1000000.0))
        ).alias("wv"),
        ((F.col("us2") - F.col("us")) / F.lit(1000000.0)).alias("dt"),
    )
    dtsum = F.round(F.sum(F.col("dt").cast("decimal(28,8)")), 2).cast("double")
    return (
        terms.groupBy("user_id")
        .agg(
            (
                F.round(F.sum(F.col("wv").cast("decimal(28,8)")), 2).cast(
                    "double"
                )
                / dtsum
            ).alias("twa"),
            F.count("*").cast("long").alias("n_segments"),
            dtsum.alias("__dt"),
        )
        .where(F.col("__dt") > 0)
        .drop("__dt")
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, quantile_cont(cnt, 0.5) AS med
        FROM daily GROUP BY event_type
    ), mad AS (
        SELECT d.event_type,
               quantile_cont(ABS(d.cnt - m.med), 0.5) AS mad
        FROM daily d JOIN med m USING (event_type)
        GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, d.cnt, m.med, a.mad
    FROM daily d
    JOIN med m USING (event_type)
    JOIN mad a USING (event_type)
    WHERE ABS(d.cnt - m.med) > CAST(3.0 AS DOUBLE) * a.mad
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags: a day is anomalous for an
    event type when its count deviates from the type's median by
    more than 3× the median absolute deviation — the
    outlier-resistant alternative to mean/stddev gates (one bad day
    cannot shift its own threshold much).

    Plan: the only corpus-sized work is the (type, day) count —
    map-side combinable onto a day-grain key; medians/MAD run on the
    tiny daily table. Exactness: exact interpolated medians of
    integers land on halves, MAD on quarters — dyadic values both
    engines represent exactly; comparisons are pure IEEE."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("cnt"), F.lit(0.5)).alias("med")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("cnt") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
    )
    return (
        daily.join(med, "event_type")
        .join(mad, "event_type")
        .where(
            F.abs(F.col("cnt") - F.col("med")) > F.lit(3.0) * F.col("mad")
        )
        .select("event_type", "day", "cnt", "med", "mad")
    )


@query(
    "ts_seasonal_naive_error",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), j AS (
        SELECT a.event_type, a.cnt, f.cnt AS fc
        FROM daily a
        JOIN daily f ON f.event_type = a.event_type
                    AND f.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(cnt - fc)) AS DOUBLE) / COUNT(*) AS mae,
           CAST(ROUND(SUM(CAST(
               ABS(cnt - fc) / ((cnt + fc) / CAST(2.0 AS DOUBLE))
             AS DECIMAL(28,8))), 6) AS DOUBLE) / COUNT(*) AS smape
    FROM j GROUP BY event_type
    """,
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7-days) forecast error per event type —
    the baseline every real forecaster must beat, and the drift
    primitive behind week-over-week alerting. Day-exact join (a
    calendar self-join on day−7, NOT a lag over rows, so missing
    days can't silently shift the season). MAE is integer-exact;
    sMAPE terms are one IEEE division each, summed through decimal.
    All work after the map-side-combined daily count runs on the
    day-grain table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    f = daily.select(
        "event_type",
        (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("cnt").alias("fc"),
    )
    j = daily.join(f, ["event_type", "day"])
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        (
            F.sum(F.abs(F.col("cnt") - F.col("fc"))).cast("double")
            / F.count("*")
        ).alias("mae"),
        (
            F.round(
                F.sum(
                    (
                        F.abs(F.col("cnt") - F.col("fc"))
                        / ((F.col("cnt") + F.col("fc")) / F.lit(2.0))
                    ).cast("decimal(28,8)")
                ),
                6,
            ).cast("double")
            / F.count("*")
        ).alias("smape"),
    )


@query(
    "attribution_position",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_id AS t_id, ts AS t_ts,
               event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
        SELECT p.p_id, p.value, t.channel,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(row_number() OVER
                    (PARTITION BY p.p_id ORDER BY t.t_ts, t.t_id)
                    AS BIGINT) AS rn
        FROM p JOIN t ON t.user_id = p.user_id AND t.t_ts < p.p_ts
        WINDOW w AS (PARTITION BY p.p_id)
    ), c AS (
        SELECT channel, p_id,
               value * (CASE
                   WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                   WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                   WHEN rn = 1 THEN CAST(0.4 AS DOUBLE)
                   WHEN rn = n THEN CAST(0.4 AS DOUBLE)
                   ELSE CAST(0.2 AS DOUBLE) / (n - 2) END) AS credit
        FROM j
    )
    SELECT channel,
           CAST(ROUND(SUM(CAST(credit AS DECIMAL(28,8))), 4) AS DOUBLE)
             AS total_credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches_credited,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions
    FROM c GROUP BY channel
    """,
)
def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution:
    first and last touch before each purchase get 40% each, the
    middle touches share the remaining 20% (single touch: 100%;
    two touches: 50/50). Same single user-key join shape as
    ``attribution_linear``; the count and rank windows both cluster
    on (user, purchase), so they reuse the join's user partitioning
    on the shuffled path. Credit fractions are fixed-parse-tree IEEE
    doubles; totals ride DECIMAL(28,8)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(t, "user_id").where(F.col("t_ts") < F.col("p_ts"))
    wc = Window.partitionBy("user_id", "p_id")
    wr = Window.partitionBy("user_id", "p_id").orderBy("t_ts", "t_id")
    j = j.withColumn("n", F.count("*").over(wc).cast("long")).withColumn(
        "rn", F.row_number().over(wr).cast("long")
    )
    frac = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rn") == 1, F.lit(0.4))
        .when(F.col("rn") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    c = j.select(
        "channel", "p_id", (F.col("value") * frac).alias("credit")
    )
    return c.groupBy("channel").agg(
        F.round(F.sum(F.col("credit").cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("total_credit"),
        F.count("*").cast("long").alias("n_touches_credited"),
        F.countDistinct("p_id").cast("long").alias("n_conversions"),
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH b AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar,
               ts, event_id, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, bar
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM b
    )
    SELECT event_type, bar,
           MIN(CASE WHEN rn_a = 1 THEN v END) AS open,
           MAX(v) AS high,
           MIN(v) AS low,
           MIN(CASE WHEN rn_d = 1 THEN v END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY event_type, bar
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    downsample (finance candles, telemetry rollups). open/close are
    ``min_by``/``max_by`` over a (ts, event_id) precedence struct —
    single-value picks (exact doubles, no accumulation) computed as
    partial-combining AGGREGATES on one (type, hour) exchange; the
    oracle expresses the same tie-broken picks with windows (it is
    not graded for scale)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    key = F.struct("ts", "event_id")
    return ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
    ).agg(
        F.min_by(F.col("value").cast("double"), key).alias("open"),
        F.max(F.col("value").cast("double")).alias("high"),
        F.min(F.col("value").cast("double")).alias("low"),
        F.max_by(F.col("value").cast("double"), key).alias("close"),
        F.count("*").cast("long").alias("n_events"),
    )


@query(
    "ts_autocorrelation",
    oracle="""
    WITH c AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s
        FROM c GROUP BY 1
    ), d AS (
        SELECT c.event_type, c.h,
               CAST(c.cnt AS DOUBLE) - (CAST(st.s AS DOUBLE) / st.n)
                 AS dev
        FROM c JOIN st USING (event_type)
    ), den AS (
        SELECT event_type,
               CAST(ROUND(SUM(CAST(dev * dev AS DECIMAL(38,8))), 0)
                    AS DOUBLE) AS ss
        FROM d GROUP BY 1
    ), num AS (
        SELECT a.event_type, lg.lag AS lag,
               CAST(ROUND(SUM(CAST(a.dev * b.dev AS DECIMAL(38,8))), 0)
                    AS DOUBLE) AS cp,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM d a
        JOIN (SELECT UNNEST([1, 2, 3]) AS lag) lg ON TRUE
        JOIN d b ON b.event_type = a.event_type AND b.h = a.h + lg.lag
        GROUP BY 1, 2
    )
    SELECT num.event_type, CAST(lag AS INTEGER) AS lag,
           cp / ss AS acf, n_pairs
    FROM num JOIN den USING (event_type)
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1-3
    hours, per event type — the seasonality probe behind lag-feature
    selection and anomaly baselines. ACF(k) = sum(dev_t * dev_{t+k})
    / sum(dev_t^2) over the observed hour grid (pairs exactly k hours
    apart; missing hours contribute no pair).

    Scale shape: the raw stream collapses to the (type, hour) grid in
    ONE partial-combining exchange; everything after runs on the
    grid (hours x types — calendar-bounded metadata, ~9k rows/year
    per type), so lag self-joins and per-type stats are free at any
    corpus size. Exactness: counts are exact BIGINTs, the mean is one
    IEEE division, deviations/products are IEEE on identical operand
    bits; cross-product sums ride DECIMAL(38,8) rounded to scale 0
    (integer-magnitude values stay within the 2^53 double-cast bound
    through sf1+)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    # the grid feeds four consumers (stats, deviations, lag pairs,
    # denominator); checkpointing the calendar-bounded table keeps the
    # corpus scan at ONE instead of Catalyst re-deriving the subtree
    c = c.localCheckpoint(eager=False)
    st = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    d = c.join(st, "event_type").select(
        "event_type",
        "h",
        (
            F.col("cnt").cast("double")
            - F.col("s").cast("double") / F.col("n")
        ).alias("dev"),
    )
    den = d.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("dev") * F.col("dev")).cast("decimal(38,8)")), 0
        )
        .cast("double")
        .alias("ss")
    )
    lags = spark.range(1, 4).select(F.col("id").cast("long").alias("lag"))
    a = d.alias("a")
    b = d.alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.h") == F.col("a.h") + F.col("lag")),
        )
        .groupBy("a.event_type", "lag")
        .agg(
            F.round(
                F.sum(
                    (F.col("a.dev") * F.col("b.dev")).cast("decimal(38,8)")
                ),
                0,
            )
            .cast("double")
            .alias("cp"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    return num.join(den, "event_type").select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        (F.col("cp") / F.col("ss")).alias("acf"),
        "n_pairs",
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH c AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    ), st AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s
        FROM c GROUP BY 1
    ), d AS (
        SELECT c.event_type, c.h,
               CAST(c.cnt AS DOUBLE) - (CAST(st.s AS DOUBLE) / st.n)
                 AS dev
        FROM c JOIN st USING (event_type)
    ), ssq AS (
        SELECT event_type,
               CAST(ROUND(SUM(CAST(dev * dev AS DECIMAL(38,8))), 0)
                    AS DOUBLE) AS ss
        FROM d GROUP BY 1
    ), num AS (
        SELECT lg.lag AS lag,
               CAST(ROUND(SUM(CAST(a.dev * b.dev AS DECIMAL(38,8))), 0)
                    AS DOUBLE) AS cp,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM d a
        JOIN (SELECT UNNEST([-3,-2,-1,0,1,2,3]) AS lag) lg ON TRUE
        JOIN d b ON a.event_type = 'click'
               AND b.event_type = 'purchase'
               AND b.h = a.h + lg.lag
        GROUP BY 1
    )
    SELECT CAST(num.lag AS INTEGER) AS lag,
           cp / (sqrt(ca.ss) * sqrt(cb.ss)) AS xcorr, n_pairs
    FROM num,
         (SELECT ss FROM ssq WHERE event_type = 'click') ca,
         (SELECT ss FROM ssq WHERE event_type = 'purchase') cb
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the click and purchase hourly count
    series at lags -3..+3 hours — does click volume LEAD purchase
    volume (positive-lag peak) or lag it? The lead-lag probe behind
    campaign attribution and capacity planning. Same single-scan
    grid collapse as `ts_autocorrelation` (the corpus touches one
    partial-combining exchange; the localCheckpointed grid feeds
    stats, deviations, and the lag join), normalized by the two
    series' own sums of squares."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    c = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    c = c.localCheckpoint(eager=False)
    st = c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    d = c.join(st, "event_type").select(
        "event_type",
        "h",
        (
            F.col("cnt").cast("double")
            - F.col("s").cast("double") / F.col("n")
        ).alias("dev"),
    )
    ss = d.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("dev") * F.col("dev")).cast("decimal(38,8)")), 0
        )
        .cast("double")
        .alias("ss")
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("lag"))
    a = d.where(F.col("event_type") == "click").alias("a")
    b = d.where(F.col("event_type") == "purchase").alias("b")
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.h") == F.col("a.h") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.round(
                F.sum(
                    (F.col("a.dev") * F.col("b.dev")).cast("decimal(38,8)")
                ),
                0,
            )
            .cast("double")
            .alias("cp"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    ca = ss.where(F.col("event_type") == "click").select(
        F.col("ss").alias("ss_a")
    )
    cb = ss.where(F.col("event_type") == "purchase").select(
        F.col("ss").alias("ss_b")
    )
    return (
        num.crossJoin(F.broadcast(ca))
        .crossJoin(F.broadcast(cb))
        .select(
            F.col("lag").cast("int").alias("lag"),
            (
                F.col("cp")
                / (F.sqrt(F.col("ss_a")) * F.sqrt(F.col("ss_b")))
            ).alias("xcorr"),
            "n_pairs",
        )
    )
