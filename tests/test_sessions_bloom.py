"""Round-3 batch 5: sessionization, Bloom filter, per-group sampling,
winsorize — property tests beyond the differential oracles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tms_etl_spark.operators.bloom import bloom_probe, build_bloom, pack_bloom
from tms_etl_spark.operators.funnel import sessionize
from tms_etl_spark.operators.sampling import per_group_sample


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_sessionize_splits_on_gap(spark):
    rows = [
        # user 1: events at 0, 10, 50, 55 min → gap 40 splits: sessions 1,1,2,2
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(50)),
        (4, 1, _ts(55)),
        # user 2: single event
        (5, 2, _ts(0)),
        # user 3: exactly 30-minute gap is NOT a split (strictly greater)
        (6, 3, _ts(0)),
        (7, 3, _ts(30)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: (r["session_start"], r["session_seq"])
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        1: (1, 1),
        2: (0, 1),
        3: (1, 2),
        4: (0, 2),
        5: (1, 1),
        6: (1, 1),
        7: (0, 1),
    }


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    probes = spark.range(0, 5000).select(F.col("id").alias("k"))
    m_bits, depth = 4096, 3
    words = pack_bloom(build_bloom(members, "k", m_bits, depth), m_bits)
    assert len(words) == m_bits // 64
    got = bloom_probe(words, probes, "k", m_bits, depth).collect()
    hits = {r["k"] for r in got if r["bloom_hit"]}
    assert set(range(100)) <= hits  # every member hits
    fp = len(hits) - 100
    assert fp / 4900 < 0.05  # theory: ~0.1% at this geometry


def test_bloom_merge_by_union(spark):
    a = spark.range(0, 50).select(F.col("id").alias("k"))
    b = spark.range(50, 100).select(F.col("id").alias("k"))
    both = spark.range(0, 100).select(F.col("id").alias("k"))
    m_bits, depth = 2048, 3
    merged = (
        build_bloom(a, "k", m_bits, depth)
        .union(build_bloom(b, "k", m_bits, depth))
        .distinct()
    )
    direct = build_bloom(both, "k", m_bits, depth)
    assert pack_bloom(merged, m_bits) == pack_bloom(direct, m_bits)


def test_per_group_sample_exact_quotas(spark):
    rows = [(i, "a" if i < 200 else "b") for i in range(230)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = per_group_sample(df, "lang", "doc_id", k=40).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["a"]) == 40  # exact quota
    assert len(by["b"]) == 30  # min(k, group size)
    again = per_group_sample(df, "lang", "doc_id", k=40).collect()
    assert {(r["lang"], r["doc_id"]) for r in again} == {
        (r["lang"], r["doc_id"]) for r in got
    }
