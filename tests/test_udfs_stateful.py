"""UDAF + custom stateful operator tests (SURVEY.md §2.10, T6)."""

from __future__ import annotations

import math

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
