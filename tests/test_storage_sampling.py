"""Storage-layout + sampling operator tests."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tms_etl_spark.operators.storage import (
    compact_small_files,
    hash_split,
    sample_stratified,
    write_sorted_parquet,
)
from tms_etl_spark.sources.tables import load_table


def test_compact_small_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(24).write.parquet(out)  # fragment: 24 files
    before = len(glob.glob(f"{out}/*.parquet"))
    rows_before = spark.read.parquet(out).count()
    # target >= total bytes -> exactly one output file, no count() pass
    compact_small_files(spark, out, target_file_bytes=1 << 40)
    after = len(glob.glob(f"{out}/*.parquet"))
    assert after == 1 and after < before
    assert spark.read.parquet(out).count() == rows_before


def test_write_sorted_parquet_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sorted")
    li = load_table(spark, sf_dir, "lineitem")
    write_sorted_parquet(li, out, layout_cols=["l_suppkey"], num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # each file owns a contiguous l_suppkey range: per-file min/max
    # ranges must not overlap (allowing the range-partitioner's
    # boundary key to appear in two adjacent files)
    stats = (
        back.groupBy(F.col("_metadata.file_path").alias("f"))
        .agg(F.min("l_suppkey").alias("lo"), F.max("l_suppkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] <= cur["lo"]


def test_sample_stratified_respects_fractions(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    s = sample_stratified(
        ev, "event_type", {"click": 0.5, "purchase": 1.0, "error": 0.0}
    )
    got = {r["event_type"]: r["count"] for r in s.groupBy("event_type").count().collect()}
    tot = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert got.get("error", 0) == 0
    assert got["purchase"] == tot["purchase"]
    assert 0.3 * tot["click"] < got["click"] < 0.7 * tot["click"]
    assert "view" not in got  # unlisted classes are dropped by sampleBy
    # deterministic for fixed seed
    s2 = sample_stratified(
        ev, "event_type", {"click": 0.5, "purchase": 1.0, "error": 0.0}
    )
    assert sorted(r["event_id"] for r in s.collect()) == sorted(
        r["event_id"] for r in s2.collect()
    )


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = hash_split(d, "doc_id")
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    n = d.count()
    assert 0.7 * n < counts["train"] < 0.9 * n
    assert counts.get("validation", 0) + counts.get("test", 0) == n - counts["train"]
    # stable across partitionings (the property fraction-sampling lacks)
    b = hash_split(d.repartition(13), "doc_id")
    ma = {r["doc_id"]: r["split"] for r in a.select("doc_id", "split").collect()}
    mb = {r["doc_id"]: r["split"] for r in b.select("doc_id", "split").collect()}
    assert ma == mb


def test_temperature_sample_flattens_mixture(spark, sf_dir):
    """alpha=0.5 shares must sit between uniform and proportional:
    rare classes get MORE than their frequency share, common classes
    less; shares sum to 1; decisions are deterministic."""
    import math

    from tms_etl_spark.operators.sampling import temperature_sample

    d = load_table(spark, sf_dir, "documents")
    out = temperature_sample(d, budget=300)
    rows = out.collect()
    by_class = {}
    for r in rows:
        by_class.setdefault(r["lang"], r["share"])
    counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    sq_total = sum(math.sqrt(n) for n in counts.values())
    assert abs(sum(by_class.values()) - 1.0) < 1e-9
    for lang, share in by_class.items():
        freq = counts[lang] / total
        expect = math.sqrt(counts[lang]) / sq_total
        assert abs(share - expect) < 1e-6
        if freq < 1 / len(counts):
            assert share > freq  # rare class upweighted
        elif freq > 1 / len(counts):
            assert share < freq  # common class downweighted
    # deterministic: re-evaluation produces identical decisions
    again = {(r["doc_id"], r["sampled"]) for r in out.collect()}
    assert again == {(r["doc_id"], r["sampled"]) for r in rows}
