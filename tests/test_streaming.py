"""Streaming-surface tests (SURVEY.md §2.9): file-stream ingestion
with foreachBatch MERGE (T1/T2), windowed aggregates under a real
streaming query (T4/T5), stateful dedup (T6), update-mode counts
(T7). Memory sinks + availableNow triggers make these synchronous.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_tms_pipeline import _row
from tms_etl_spark.sources.tables import load_table
from tms_etl_spark.streaming.incremental import (
    dedup_stream,
    running_status_counts,
    stream_import,
    tumbling_counts,
)


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    """Materialize the events table as a small parquet dir that a
    stream can replay (µs timestamps, so no NANOS issue)."""
    out = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(out)
    return out


def test_loader_event_time_is_timestamp(spark, sf_dir, tmp_path):
    """Regression: the loader seam must hand every consumer a plain
    TIMESTAMP event-time column, whatever the parquet's physical
    encoding (nanos-as-long OR timestamp[us] without UTC adjustment,
    which Spark reads as TIMESTAMP_NTZ). NTZ breaks ``unix_micros``
    (funnel/sessionize) and ``withWatermark`` (T3-T6) — this test
    fails if the ``normalize_event_time`` cast is ever removed."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from tms_etl_spark.sources.tables import normalize_event_time

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)

    # and the seam itself repairs a synthetic NTZ frame (what a
    # regenerated testdata drop would produce)
    ntz = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, 1 AS k")
    assert isinstance(ntz.schema["ts"].dataType, TimestampNTZType)
    fixed = normalize_event_time(ntz)
    assert isinstance(fixed.schema["ts"].dataType, TimestampType)
    # watermark is accepted post-normalization (the T3 contract)
    tumbling_counts(fixed.withColumn("event_type", F.lit("x")).withColumn(
        "value", F.lit(1.0)
    )).collect()


def test_stream_import_merges_and_is_idempotent(spark, tmp_path):
    lake = tmp_path / "lake" / "2024-01" / "daily"
    lake.mkdir(parents=True)
    (lake / "a.csv").write_text(
        "\n".join(
            [
                _row("2024-01-05.A", "00001", ef="50.0"),
                _row("2024-01-05.C", "00002", func="0", par="440"),
            ]
        ),
        encoding="utf-8",
    )
    target = str(tmp_path / "fact")
    q = stream_import(
        spark, str(tmp_path / "lake"), target, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    t = spark.read.parquet(target)
    assert t.count() == 2

    # new file arrives: desligado for existing key must not overwrite,
    # normal update must.
    (lake / "b.csv").write_text(
        "\n".join(
            [
                _row("2024-01-05.A", "00001", ef="77.0"),
                _row("2024-01-05.C", "00002", ef="0", func="0", par="440"),
            ]
        ),
        encoding="utf-8",
    )
    q2 = stream_import(
        spark, str(tmp_path / "lake"), target, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    t2 = spark.read.parquet(target)
    assert t2.count() == 2
    eff = {r["Tear"]: r["Eficiencia"] for r in t2.collect()}
    assert eff["00001"] == 77.0  # updated


def test_stream_merge_newest_file_wins_within_microbatch(spark, tmp_path):
    """A single micro-batch spanning two files with a key collision
    must resolve by the batch pipeline's precedence (newest mtime
    wins), not arbitrarily (round-1 ADVICE item 2)."""
    import time

    lake = tmp_path / "lake" / "2024-03" / "daily"
    lake.mkdir(parents=True)
    (lake / "old.csv").write_text(
        _row("2024-03-01.A", "00001", ef="10.0"), encoding="utf-8"
    )
    time.sleep(1.1)  # distinct mtimes
    (lake / "new.csv").write_text(
        _row("2024-03-01.A", "00001", ef="88.0"), encoding="utf-8"
    )
    target = str(tmp_path / "fact")
    q = stream_import(spark, str(tmp_path / "lake"), target, str(tmp_path / "ck"))
    q.awaitTermination(120)
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1
    assert rows[0]["Eficiencia"] == 88.0


def test_streaming_tumbling_window_matches_batch(spark, sf_dir, events_stream_dir):
    batch_src = spark.read.parquet(events_stream_dir)
    expected = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in tumbling_counts(batch_src).collect()
    }

    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    agg = tumbling_counts(stream_src)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert got == expected


def test_stateful_dedup_stream(spark, events_stream_dir):
    batch_src = spark.read.parquet(events_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    deduped = dedup_stream(stream_src, keys=["user_id", "event_type"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT user_id, event_type FROM dedup_out")
    assert out.count() == out.distinct().count()
    assert out.count() == batch_src.select("user_id", "event_type").distinct().count()


def test_running_counts_update_mode(spark, events_stream_dir):
    batch_src = spark.read.parquet(events_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    q = (
        running_status_counts(stream_src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("counts_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: r["n"]
        for r in spark.sql("SELECT * FROM counts_out").collect()
    }
    want = {
        r["event_type"]: r["count"]
        for r in batch_src.groupBy("event_type").count().collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """T3: with a 1-hour watermark in append mode, an event arriving
    in a later micro-batch but stamped far before the advanced
    watermark is dropped from the streaming aggregate (batch keeps
    it). This is the bounded-state contract: late beyond the horizon
    is discarded, not buffered forever."""
    import datetime as dt

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    schema = "ts timestamp, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # batch 1: events up to 12:00 -> watermark advances to ~11:00
    write_batch("b1", [(t0 + dt.timedelta(hours=h), "x", 1.0) for h in range(13)])

    sink = str(tmp_path / "late_sink")

    def run_stream():
        # file sink in append mode: supports checkpoint recovery
        # (memory sink does not), and append emits a window only once
        # its watermark closes it — the semantics under test
        q = (
            tumbling_counts(
                spark.readStream.schema(schema).parquet(str(src)),
                window="1 hour",
                watermark="1 hour",
            )
            .select("window.start", "event_type", "n", "total")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()

    # batch 2: one very late event (hour 0, far behind the watermark)
    # plus one fresh event that moves processing forward
    write_batch("b2", [(t0, "late", 99.0), (t0 + dt.timedelta(hours=14), "x", 1.0)])
    run_stream()
    # a third pass with a fresh future event closes remaining windows
    write_batch("b3", [(t0 + dt.timedelta(hours=17), "x", 1.0)])
    run_stream()
    out = spark.read.parquet(sink).collect()
    types = {r["event_type"] for r in out}
    assert "late" not in types  # dropped: behind the watermark
    # batch semantics keep it
    batch = tumbling_counts(spark.read.parquet(str(src)), window="1 hour")
    assert "late" in {r["event_type"] for r in batch.collect()}


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join (two watermarked file streams,
    bounded state) must emit exactly the batch join's row set."""
    from tms_etl_spark.streaming.incremental import interval_join

    batch_src = spark.read.parquet(events_stream_dir)

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("l_ts")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("r_ts")
        )
        return clicks, purchases

    bc, bp = split(batch_src)
    expected = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in interval_join(bc, bp).collect()
    }
    assert expected  # non-vacuous

    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    sc, sp_ = split(stream_src)
    q = (
        interval_join(sc, sp_)
        .writeStream.format("memory")
        .queryName("ssij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM ssij").collect()
    }
    assert got == expected


def test_stream_interval_left_outer_bounded_and_sound(
    spark, sf_dir, events_stream_dir
):
    """Left-outer stream-stream interval join: Spark only accepts the
    query if the state bound is provable (watermark + time-bounded
    condition — analysis fails otherwise, so a green start IS the
    contract check). Soundness: every emitted row must appear in the
    batch left-outer result; every MATCHED pair must be emitted even
    in one availableNow pass (outer NULLs may lawfully be withheld
    until a later watermark advance)."""
    from tms_etl_spark.streaming.incremental import interval_join

    batch_src = spark.read.parquet(events_stream_dir)

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("l_ts")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("r_ts")
        )
        return clicks, purchases

    bc, bp = split(batch_src)
    batch_rows = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in interval_join(bc, bp, how="left_outer").collect()
    }
    assert any(r[2] is None for r in batch_rows)  # real unmatched side
    matched = {r for r in batch_rows if r[2] is not None}

    stream_src = spark.readStream.schema(batch_src.schema).parquet(
        events_stream_dir
    )
    sc, sp_ = split(stream_src)
    q = (
        interval_join(sc, sp_, how="left_outer")
        .writeStream.format("memory")
        .queryName("ssij_left")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["l_ts"], r["r_ts"])
        for r in spark.sql("SELECT * FROM ssij_left").collect()
    }
    assert matched <= got
    assert got <= batch_rows


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-static broadcast join: streaming result set must equal
    the batch join; no watermark required (stateless)."""
    from tms_etl_spark.streaming.incremental import enrich_stream

    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue"), ("view", "engagement")],
        "event_type string, category string",
    )
    batch_src = spark.read.parquet(events_stream_dir)
    expected = {
        (r["event_id"], r["category"])
        for r in enrich_stream(batch_src, dim, "event_type").collect()
    }
    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    q = (
        enrich_stream(stream_src, dim, "event_type")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["category"])
        for r in spark.sql("SELECT event_id, category FROM enriched").collect()
    }
    assert got == expected
    assert any(c is not None for _, c in got)  # join non-vacuous


def test_dedup_within_watermark_bounded_state(spark, events_stream_dir):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    horizon are removed (one row per key here — the whole replay is
    one micro-batch, well inside the 1h watermark)."""
    from tms_etl_spark.streaming.incremental import dedup_stream_within_watermark

    batch_src = spark.read.parquet(events_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(events_stream_dir)
    q = (
        dedup_stream_within_watermark(stream_src, keys=["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT user_id, event_type FROM dedup_wm")
    assert out.count() == out.distinct().count()
    assert (
        out.count()
        == batch_src.select("user_id", "event_type").distinct().count()
    )
