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


def test_resize_never_upscales_and_preserves_aspect(spark, sf_dir):
    from tms_etl_spark.catalog import QUERIES, load_all

    load_all()
    rows = QUERIES["multimodal_resize"](spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        ow, oh, nw, nh = (
            r["orig_width"], r["orig_height"], r["new_width"], r["new_height"]
        )
        assert 1 <= max(nw, nh) <= 256 or max(ow, oh) <= 256
        assert nw <= max(ow, 1) and nh <= max(oh, 1)  # never upscale
        if max(ow, oh) > 256:
            # exact floor-scaled dims (the math IS the contract)
            scale = 256 / max(ow, oh, 1)
            assert nw == max(int(ow * scale), 1), r
            assert nh == max(int(oh * scale), 1), r
        assert len(r["resized_digest"]) == 64


def test_resize_digest_deterministic(spark, sf_dir):
    from tms_etl_spark.catalog import QUERIES, load_all

    load_all()
    q = QUERIES["multimodal_resize"]
    a = {r["doc_id"]: r["resized_digest"] for r in q(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["resized_digest"] for r in q(spark, sf_dir).collect()}
    assert a == b and a


def test_chunk_audio_covers_duration(spark, sf_dir):
    """Chunk windows tile [0, duration): consecutive chunks overlap by
    exactly 1 s, the last chunk ends at the duration, and every chunk
    is non-empty."""
    from tms_etl_spark.catalog import QUERIES, load_all

    load_all()
    rows = QUERIES["multimodal_chunk_audio"](spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_id, chunks in list(by_doc.items())[:100]:
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["chunk_start_s"] == 0.0
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start_s"] == a["chunk_start_s"] + 9.0  # 10s - 1s overlap
            assert a["chunk_end_s"] > b["chunk_start_s"]  # overlap
        last = chunks[-1]
        assert last["chunk_end_s"] >= last["chunk_start_s"]
        # full coverage: last chunk reaches the end of the recording
        assert last["chunk_end_s"] == max(c["chunk_end_s"] for c in chunks)


def test_chunk_audio_rejects_bad_params(spark, sf_dir):
    import pytest

    from tms_etl_spark.operators.multimodal import (
        attach_binary_payload,
        chunk_audio_plan,
    )
    from tms_etl_spark.sources.tables import load_table

    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    with pytest.raises(ValueError):
        chunk_audio_plan(docs, chunk_s=1.0, overlap_s=2.0)


def test_codec_seam_extract_features(spark, sf_dir):
    """A user-supplied decoder flows through the seam (cloudpickled to
    executors); the default stub stays bit-identical without it."""

    def fake_real_codec(payload: bytes):
        # self-contained, like a real PIL/ffmpeg wrapper must be
        return 640, 480, [float(len(payload) % 7)] * 8

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_binary_payload(docs)
    rows = extract_features(media, decode_fn=fake_real_codec).collect()
    assert rows and all(r["width"] == 640 and r["height"] == 480 for r in rows)
    # digest/n_bytes are codec-independent payload facts
    assert all(len(r["digest"]) == 64 for r in rows)
    # default path unchanged
    stub = extract_features(media).orderBy("doc_id").first()
    digest = hashlib.sha256(
        docs.orderBy("doc_id").first()["text"].encode()
    ).digest()
    assert stub["width"] == int.from_bytes(digest[0:2], "big") % 1920


def test_codec_seam_resize(spark, sf_dir):
    from tms_etl_spark.operators.multimodal import resize_images

    def fake_dims(payload: bytes):
        return 512, 256  # forces a 2:1 downscale to 256x128

    def fake_resample(payload: bytes, nw: int, nh: int) -> bytes:
        return b"RESIZED" + nw.to_bytes(2, "big") + nh.to_bytes(2, "big")

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_binary_payload(docs)
    rows = resize_images(
        media, max_side=256, decode_fn=fake_dims, resample_fn=fake_resample
    ).collect()
    expect = hashlib.sha256(
        b"RESIZED" + (256).to_bytes(2, "big") + (128).to_bytes(2, "big")
    ).hexdigest()
    assert rows
    for r in rows:
        assert (r["new_width"], r["new_height"]) == (256, 128)
        assert r["resized_digest"] == expect


def test_perceptual_hash_locality_and_separation(spark):
    """aHash semantics: identical payloads → hamming 0; a 3-byte
    in-place edit stays within the near-dup radius; unrelated
    payloads do not pair."""
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.multimodal import (
        perceptual_hash,
        phash_neardup_pairs,
    )

    import random

    rng = random.Random(11)
    base = bytes(rng.randrange(256) for _ in range(4096))
    edited = bytearray(base)
    for pos in (10, 500, 2000):
        edited[pos] ^= 0xFF
    unrelated = bytes(rng.randrange(256) for _ in range(4096))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, bytes(base)),       # exact duplicate
            (3, bytes(edited)),     # 3-byte in-place edit
            (4, unrelated),
        ],
        ["doc_id", "payload"],
    )
    sigs = {r["doc_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert sigs[1] == sigs[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_neardup_pairs(perceptual_hash(df)).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert not any(4 in p for p in pairs)
