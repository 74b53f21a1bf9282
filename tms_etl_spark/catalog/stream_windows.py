"""Event-time window queries (SURVEY.md §2.9 T4/T5) — batch-semantics
forms of the streaming aggregates, oracle-checked. The streaming
execution of the same operators (watermarks, availableNow triggers,
memory sinks) is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import sql_dsum
from tms_etl_spark.sources.tables import load_table
from tms_etl_spark.streaming.incremental import session_counts, tumbling_counts


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n, {sql_dsum("value", "total")}
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: 1-hour tumbling window counts+sums per event type."""
    ev = load_table(spark, sf_dir, "events")
    agg = tumbling_counts(ev, window="1 hour")
    return agg.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "total"
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH assigned AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, value
        FROM events
        UNION ALL
        SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP), value
        FROM events
    )
    SELECT window_start, COUNT(*) AS n
    FROM assigned GROUP BY window_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: sliding window (2h long, 1h slide) — every event lands in
    two windows; Spark's Expand does the assignment map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: session windows with a 30-minute gap, per user. The oracle
    is the classic gaps-and-islands rewrite (lag → new-session flag →
    running sum → group) — the batch-equivalent the engine's
    streaming session_window must agree with."""
    ev = load_table(spark, sf_dir, "events")
    sess = session_counts(ev, gap="30 minutes")
    return sess.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        "n_events",
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT c.user_id,
           CAST(c.ts AS TIMESTAMP) AS l_ts,
           CAST(p.ts AS TIMESTAMP) AS r_ts
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-row depth: stream-stream interval join, batch-semantics form
    (click→purchase attribution within 30 minutes per user). The
    STREAMING execution of the same operator — two file streams, both
    watermarked, bounded join state — is exercised in
    tests/test_streaming.py and must produce the identical row set."""
    from tms_etl_spark.streaming.incremental import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    return interval_join(
        clicks, purchases.withColumnRenamed("r_user", "user_id")
    )


@query(
    "timeseries_resample_ffill",
    oracle=f"""
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket_start,
               COUNT(*) AS n, {sql_dsum("value", "total")}
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type, min(bucket_start) AS lo, max(bucket_start) AS hi
        FROM b GROUP BY 1
    ), cal AS (
        SELECT s.event_type,
               CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS TIMESTAMP) AS bucket_start
        FROM s
    ), filled AS (
        SELECT c.event_type, c.bucket_start, b.n, b.total
        FROM cal c LEFT JOIN b
          ON b.event_type = c.event_type AND b.bucket_start = c.bucket_start
    )
    SELECT event_type, bucket_start, n,
           last_value(total IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY bucket_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS total_ffill
    FROM filled
    """,
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill + forward fill
    (operators.resample): hourly buckets per event type, missing
    hours materialized from each key's own [min, max] span (~40 real
    gaps per type at sf0.01 — non-vacuous), the decimal-exact value
    sum carried forward across them, raw counts left NULL so gaps
    stay visible. The reference's powered-off looms produce exactly
    this shape (days of missing buckets under every report)."""
    from tms_etl_spark.catalog.exact import dsum
    from tms_etl_spark.operators.resample import fill_gaps, resample

    ev = load_table(spark, sf_dir, "events")
    hourly = resample(
        ev,
        ["event_type"],
        "ts",
        "1 hour",
        [F.count("*").alias("n"), dsum("value", "total")],
    )
    filled = fill_gaps(
        hourly, ["event_type"], "bucket_start", "1 hour", ffill_cols=["total"]
    )
    return filled.select(
        "event_type", "bucket_start", "n", F.col("total").alias("total_ffill")
    )


@query(
    "stream_interval_join_left",
    oracle="""
    SELECT c.user_id,
           CAST(c.ts AS TIMESTAMP) AS l_ts,
           CAST(p.ts AS TIMESTAMP) AS r_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval join: every click, with its attributed
    30-minute purchase OR NULL — the "never converted" rows an
    attribution funnel reports on. Streaming-wise the outer emission
    waits for the right watermark to pass the interval end (state
    stays bounded); batch-wise it is this plain outer range join
    (`streaming/incremental.py:interval_join(how='left_outer')`)."""
    from tms_etl_spark.streaming.incremental import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    return interval_join(
        clicks,
        purchases.withColumnRenamed("r_user", "user_id"),
        how="left_outer",
    )
