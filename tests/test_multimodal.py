"""Multimodal plumbing tests: binary payload schema, Arrow-batched
decode stub, frame-sampling fan-out."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tms_etl_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample_plan,
)
from tms_etl_spark.sources.tables import load_table


def test_payload_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    schema = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert schema["payload"] == "binary"
    assert schema["media_meta"].startswith("struct<modality:string")

    feats = extract_features(media).orderBy("doc_id").collect()
    assert len(feats) == 20
    # digest must equal a locally computed sha256 of the same text
    doc0 = docs.orderBy("doc_id").first()
    f0 = feats[0]
    expect = hashlib.sha256(doc0["text"].encode()).hexdigest()
    assert f0["digest"] == expect
    assert f0["n_bytes"] == len(doc0["text"].encode())
    assert len(f0["feat"]) == 8
    assert all(0.0 <= x <= 1.0 for x in f0["feat"])


def test_extract_features_is_stable_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = extract_features(attach_binary_payload(docs)).orderBy("doc_id").collect()
    b = (
        extract_features(attach_binary_payload(docs.repartition(7)))
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_frame_sample_fanout(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = attach_binary_payload(docs, modality="video")
    frames = frame_sample_plan(media, every_s=1.0)
    per_doc = (
        frames.groupBy("doc_id").agg(F.count("*").alias("n")).orderBy("doc_id")
    ).collect()
    metas = media.select("doc_id", "media_meta.duration_s").orderBy("doc_id").collect()
    for got, meta in zip(per_doc, metas):
        assert got["n"] == max(int(meta["duration_s"]), 1)
