"""UDAF + custom stateful operator tests (SURVEY.md §2.10, T6)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.operators.udfs import (
    ewma_by_key,
    ewma_stream_by_key,
    make_weighted_avg_udaf,
    weighted_avg_expr,
)
from tms_etl_spark.sources.tables import load_table


def test_weighted_avg_udaf_matches_expression(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    expr_res = {
        r["l_returnflag"]: r["wa"]
        for r in li.groupBy("l_returnflag")
        .agg(weighted_avg_expr("l_extendedprice", "l_quantity").alias("wa"))
        .collect()
    }
    udaf = make_weighted_avg_udaf()
    udaf_res = {
        r["l_returnflag"]: r["wa"]
        for r in li.groupBy("l_returnflag")
        .agg(udaf("l_extendedprice", "l_quantity").alias("wa"))
        .collect()
    }
    assert set(expr_res) == set(udaf_res)
    for k in expr_res:
        assert math.isclose(expr_res[k], udaf_res[k], rel_tol=1e-9)


def test_ewma_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(500)
    out = ewma_by_key(ev, key="user_id", ts="ts", value="value")
    all_rows = out.collect()
    user = all_rows[0]["user_id"]
    rows = [r for r in all_rows if r["user_id"] == user]
    src = sorted(
        [(r["ts"], r["value"]) for r in ev.where(F.col("user_id") == user).collect()]
    )
    got = sorted([(r["ts"], r["ewma"]) for r in rows])
    ew = None
    for (ts, v), (gts, gew) in zip(src, got):
        ew = v if ew is None else 0.3 * v + 0.7 * ew
        assert ts == gts
        assert math.isclose(ew, gew, rel_tol=1e-12)


def test_ewma_stateful_stream(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").where(F.col("user_id") < 30).limit(
        1000
    ).repartition(2).write.parquet(src_dir)
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = (
        ewma_stream_by_key(stream, key="user_id", ts="ts", value="value")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["user_id"]: r for r in spark.sql("SELECT * FROM ewma_out").collect()}
    # every user's n_seen equals their batch count
    counts = {
        r["user_id"]: r["count"]
        for r in batch.groupBy("user_id").count().collect()
    }
    assert set(out) == set(counts)
    for u, r in out.items():
        assert r["n_seen"] == counts[u]
        assert r["ewma"] is not None


def _protobuf_available() -> bool:
    # transformWithState's state server speaks protobuf to the Python
    # worker; without the package the driver worker crashes at init
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (not in this env); "
    "the operator's plan construction is still covered by "
    "test_running_stats_stream_compiles",
)
def test_running_stats_transform_with_state(spark, sf_dir, tmp_path):
    """The transformWithState form must agree with a batch groupBy
    over the same data (count exact; total within float tolerance)."""
    from tms_etl_spark.operators.udfs import running_stats_stream

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src_dir = str(tmp_path / "ev")
        load_table(spark, sf_dir, "events").where(
            F.col("user_id") < 30
        ).limit(1000).repartition(2).write.parquet(src_dir)
        batch = spark.read.parquet(src_dir)
        stream = spark.readStream.schema(batch.schema).parquet(src_dir)
        q = (
            running_stats_stream(stream, key="user_id", value="value")
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM tws_out").collect()
        }
        expect = {
            r["user_id"]: r
            for r in batch.groupBy("user_id")
            .agg(
                F.count("value").alias("n"),
                F.sum("value").alias("total"),
                F.max("value").alias("vmax"),
            )
            .collect()
        }
        assert set(out) == set(expect)
        for u, e in expect.items():
            assert out[u]["n_seen"] == e["n"]
            assert abs(out[u]["total"] - e["total"]) < 1e-6
            assert out[u]["vmax"] == e["vmax"]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )


def test_running_stats_stream_compiles(spark, sf_dir, tmp_path):
    """Plan-level pin for the transformWithState operator: the
    streaming DataFrame must build with the TransformWithState node
    and the declared output schema even where the protobuf runtime
    dependency is absent (execution covered by the skipif test)."""
    from tms_etl_spark.operators.udfs import running_stats_stream

    src_dir = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").limit(100).write.parquet(src_dir)
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    out = running_stats_stream(stream, key="user_id", value="value")
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_seen",
        "total",
        "vmax",
    ]
    assert "TransformWithStateInPySpark" in out._jdf.queryExecution().logical().toString()


def test_status_line_udtf_lateral_join(spark):
    """Python UDTF: blob -> rows, composed via SQL LATERAL."""
    from tms_etl_spark.operators.udfs import make_status_line_udtf

    spark.udtf.register("parse_status", make_status_line_udtf())
    spark.createDataFrame(
        [(1, "Tear 001 ---> Com Sucesso\nnoise\nTear 002 ---> Desligada"),
         (2, None)],
        "batch_id long, log_text string",
    ).createOrReplaceTempView("logs_udtf")
    rows = spark.sql(
        "SELECT l.batch_id, s.loom, s.status "
        "FROM logs_udtf l, LATERAL parse_status(l.log_text) s"
    ).collect()
    assert {(r["batch_id"], r["loom"], r["status"]) for r in rows} == {
        (1, "Tear 001", "Com Sucesso"),
        (1, "Tear 002", "Desligada"),
    }


def test_anomaly_stream_compiles(spark, sf_dir, tmp_path):
    """Plan-level pin for the Welford anomaly processor (protobuf
    runtime absent here; logic covered by the replay test below)."""
    from tms_etl_spark.operators.udfs import anomaly_stream_by_key

    src_dir = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").limit(100).write.parquet(src_dir)
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    out = anomaly_stream_by_key(stream, key="user_id", ts="ts", value="value")
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "ts",
        "value",
        "zscore",
    ]
    assert (
        "TransformWithStateInPySpark"
        in out._jdf.queryExecution().logical().toString()
    )


def test_anomaly_processor_welford_replay():
    """The processor's scoring logic, replayed in pure Python against
    a naive two-pass reference: an event is flagged iff it deviates
    more than z sigmas from the statistics of the PRIOR prefix."""
    import math
    import random

    rng = random.Random(7)
    xs = [rng.gauss(10, 1) for _ in range(200)] + [50.0] + [
        rng.gauss(10, 1) for _ in range(50)
    ]

    # processor logic (mirror of _AnomalyProcessor.handleInputRows)
    n, mean, m2 = 0, 0.0, 0.0
    flagged = []
    for i, v in enumerate(xs):
        if n >= 10:
            sd = math.sqrt(m2 / n)
            if sd > 0 and abs(v - mean) / sd > 3.0:
                flagged.append(i)
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)

    # naive reference: prefix mean/population-sd per position
    expect = []
    for i, v in enumerate(xs):
        if i >= 10:
            pre = xs[:i]
            mu = sum(pre) / i
            sd = math.sqrt(sum((p - mu) ** 2 for p in pre) / i)
            if sd > 0 and abs(v - mu) / sd > 3.0:
                expect.append(i)
    assert flagged == expect
    assert 200 in flagged  # the planted outlier


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (not in this env); "
    "logic pinned by test_anomaly_processor_welford_replay",
)
def test_anomaly_stream_live(spark, sf_dir, tmp_path):
    """Live drive of the Welford anomaly stream: plant one extreme
    outlier among stable values; only it should be flagged."""
    from tms_etl_spark.operators.udfs import anomaly_stream_by_key

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), 10.0 + (i % 3) * 0.1)
        for i in range(40)
    ] + [(1, dt.datetime(2024, 1, 1, 0, 1, 0), 500.0)]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        anomaly_stream_by_key(stream, key="user_id", ts="ts", value="value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("anom_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM anom_out").collect()
    assert len(out) == 1 and out[0]["value"] == 500.0
    assert abs(out[0]["zscore"]) > 3.0
