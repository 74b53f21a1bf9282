"""Sequential / journey analytics over the events stream: Markov
transition matrices, top-k opening journeys, session bounce rates,
and a decimal-exact decayed moving average (EWMA with a power-of-two
decay).

These are the clickstream shapes that sit beside funnels and
sessionization in a product-analytics workload — each keyed on
user_id so the heavy exchange is the one the funnel family already
pays, and each arithmetic path is exact (integer counts, decimal
sums, single final IEEE divisions) so the DuckDB oracle hash-matches
bit-for-bit. Reference analog: the reference's per-shift time-series
reporting (/root/reference/src/main_01.py:443-452) generalized to
ordered event sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_USER_SEQ = ("ts", "event_id")  # total order within a user's stream


@query(
    "path_markov_transitions",
    oracle="""
    WITH nxt AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), c AS (
        SELECT event_type, next_type, COUNT(*) AS cnt
        FROM nxt WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt AS DOUBLE)
             / CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE)
             AS prob
    FROM c
    """,
)
def path_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types:
    P(next | current) estimated from consecutive event pairs per
    user. One user-key exchange for the LEAD window; the transition
    rollup then reduces onto a (types x types) grid — at most a few
    hundred rows at ANY corpus size, so everything after the window
    is broadcast-scale. The row-normalizing total rides a window
    over that tiny grid, not over raw events. Counts are integers
    and the probability is one final IEEE division — bit-exact
    cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_USER_SEQ)
    nxt = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = nxt.groupBy("event_type", "next_type").agg(
        F.count("*").alias("cnt")
    )
    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        F.col("cnt").cast("long").alias("cnt"),
        (
            F.col("cnt").cast("double")
            / F.sum("cnt").over(wt).cast("double")
        ).alias("prob"),
    )


@query(
    "path_topk_journeys",
    oracle="""
    WITH rn AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ), j AS (
        SELECT user_id, STRING_AGG(event_type, '>' ORDER BY rn) AS journey
        FROM rn WHERE rn <= 3 GROUP BY user_id
    )
    SELECT journey, CAST(COUNT(*) AS BIGINT) AS users
    FROM j GROUP BY journey
    ORDER BY users DESC, journey LIMIT 20
    """,
)
def path_topk_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k opening journeys: each user's first three event types
    concatenated in order, counted across users. row_number + the
    per-user fold share ONE user-key exchange; the journey rollup
    reduces onto at most |types|^3 keys and the final top-k compiles
    to TakeOrderedAndProject (k rows per partition to the driver,
    never a global sort). Journey strings are built from an
    array_sort over (rn, type) structs — deterministic order without
    relying on collect_list's partition order, which is exactly the
    property a 1000-executor run needs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_USER_SEQ)
    rn = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    j = rn.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("journey")
    )
    return (
        j.groupBy("journey")
        .agg(F.count("*").cast("long").alias("users"))
        .orderBy(F.desc("users"), "journey")
        .limit(20)
    )


@query(
    "session_bounce_rate",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts)
                       > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS session_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(session_start) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_seq
        FROM s
    ), per AS (
        SELECT user_id, session_seq,
               MIN(ts) AS start_ts, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CAST(CAST(start_ts AS DATE) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
    FROM per GROUP BY 1
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions that
    contain exactly one event, keyed by the session's start date.
    Reuses the funnel family's sessionize (lag + running sum, one
    user-key exchange — `operators/funnel.py`); the per-session
    rollup stays on the same user-keyed partitioning, then the daily
    reduction collapses onto calendar-day keys. Integer counts, one
    final division — exact."""
    from tms_etl_spark.operators.funnel import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    per = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("start_ts"), F.count("*").alias("n_events")
    )
    bounced = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per.withColumn("day", F.to_date("start_ts").cast("timestamp"))
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("sessions"),
            bounced.cast("long").alias("bounces"),
            (bounced.cast("double") / F.count("*").cast("double")).alias(
                "bounce_rate"
            ),
        )
    )


_EWMA_K = 16  # trailing depth; 0.5^16 ~ 1.5e-5, well above scale-8 ulp


def _ewma_terms_sql() -> str:
    # Every rounding step happens in EXACT decimal space: value is
    # coerced once at scale 4 (the catalog's dec() point), the weight
    # 0.5^k is a scale-15 decimal EXACTLY (2^-k terminates at k<=15
    # digits), their decimal product is exact, and the scale-8 ROUND
    # of that exact decimal has well-defined midpoints that Spark
    # (HALF_UP) and DuckDB (half away from zero) resolve identically
    # for either sign. A direct double->decimal(_,8) cast of the
    # product is NOT safe: value*2^-k with few mantissa bits can land
    # exactly on a scale-8 midpoint where the engines' float-cast
    # rounding modes disagree. The final CAST resets precision to 18
    # so the 16-term addition chain (18+15=33) stays under the
    # 38-digit cap — past it Spark silently drops scale.
    terms = [
        "CAST(ROUND(CAST(COALESCE(lag(value, {k}) OVER w, 0)"
        " AS DECIMAL(18,4)) * CAST(POWER(0.5, {k}) AS DECIMAL(16,15)),"
        " 8) AS DECIMAL(18,8))".format(k=k)
        for k in range(_EWMA_K)
    ]
    return " + ".join(terms)


@query(
    "ts_ewma_decay",
    oracle=f"""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST({_ewma_terms_sql()} AS DOUBLE) AS ewma16
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed trailing average (EWMA-style) with decay 1/2 over the
    last 16 events per user: ewma_t = sum_k value_{{t-k}} * 0.5^k.

    Exactness trick: the decay weight 0.5^k is an EXACT scale-15
    decimal (2^-k terminates), so each term is an exact decimal
    product whose scale-8 round is engine-agnostic (decimal-space
    midpoints, identical HALF_UP/half-away resolution), and the
    16-term decimal sum is associative — the result is bit-identical
    regardless of engine or partitioning, which a general float EWMA
    recursion can never promise. All 16 lags share ONE window spec =
    one user-key exchange; no self-join, no 16x row expansion."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_USER_SEQ)
    total = None
    for k in range(_EWMA_K):
        lagged = F.coalesce(F.lag("value", k).over(w), F.lit(0.0))
        term = F.round(
            lagged.cast("decimal(18,4)")
            * F.lit(0.5**k).cast("decimal(16,15)"),
            8,
        ).cast("decimal(18,8)")
        total = term if total is None else total + term
    return ev.select(
        "user_id", "event_id", "ts", total.cast("double").alias("ewma16")
    )


@query(
    "funnel_time_bounded",
    oracle="""
    WITH s AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        FROM events GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts > s.t_signup
          AND e.ts <= s.t_signup + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 7 DAY
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(s.t_signup) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_24h,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_7d,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / CAST(COUNT(s.t_signup) AS DOUBLE) AS signup_to_purchase
    FROM s
    """,
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: signup -> first click WITHIN 24 HOURS ->
    first purchase WITHIN 7 DAYS of that click — the
    step-deadline variant of the unbounded ordered funnel
    (events_funnel). Product analytics needs both: the unbounded
    form measures eventual conversion, this one measures conversion
    INSIDE the engagement windows that campaigns are judged on.

    Plan: three user-keyed aggregations, each consuming the previous
    stage's (user, deadline) table — every join and GROUP BY is on
    user_id, so the corpus pays one partitioning reused down the
    chain; stage tables only shrink. Counts are integers; the
    conversion share is one final IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        )
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(
            (F.col("ts") > F.col("t_signup"))
            & (F.col("ts") <= F.col("t_signup") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    totals = s.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("t_signup").cast("long").alias("n_signup"),
    )
    nc = c.agg(F.count("*").cast("long").alias("n_click_24h"))
    np_ = p.agg(F.count("*").cast("long").alias("n_purchase_7d"))
    return (
        totals.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_users",
            "n_signup",
            "n_click_24h",
            "n_purchase_7d",
            (
                F.col("n_purchase_7d").cast("double")
                / F.col("n_signup").cast("double")
            ).alias("signup_to_purchase"),
        )
    )
