"""Multimodal catalog entries.

The payloads here are UTF-8 encodings of ``documents.text`` (the
container has no image/audio codecs — the decode step is a
deterministic sha256-digest stub, see operators/multimodal.py), which
makes the whole pipeline ORACLE-BACKED: DuckDB's ``sha256(VARCHAR)``
hashes the same UTF-8 bytes, hex-substring arithmetic reproduces the
stub's dimension math, and the fan-out plans are plain arithmetic
over ``octet_length``. Only the operators' array-typed feature column
is serialized to a CSV string for the harness (pandas cannot sort
list-typed cells — the round-1 array-serialization rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample_plan,
)
from tms_etl_spark.sources.tables import load_table

# digest bytes b -> hex chars [2b+1, 2b+2]; DuckDB parses them via
# CAST('0x..' AS INTEGER). Feature bytes are digest[4:12].
_FEAT_BYTES_SQL = ",\n           ".join(
    f"CAST(concat('0x', substr(digest, {9 + 2 * i}, 2)) AS INTEGER)"
    for i in range(8)
)


@query(
    "multimodal_feature_extract",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS digest
        FROM documents
    )
    SELECT doc_id,
           'image' AS modality,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           digest,
           CAST(CAST(concat('0x', substr(digest, 1, 4)) AS INTEGER) % 1920
                AS INTEGER) AS width,
           CAST(CAST(concat('0x', substr(digest, 5, 4)) AS INTEGER) % 1080
                AS INTEGER) AS height,
           concat_ws(',',
           {_FEAT_BYTES_SQL}
           ) AS feat_bytes
    FROM d
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched decode (stubbed codec) →
    per-item features. The operator keeps its ``array<float>`` API;
    this harness entry recovers the stub's digest bytes from the
    features (``round(x*255)`` is lossless for float32(b/255)) and
    serializes them as CSV so the driver's pandas canonicalizer can
    sort the rows — and so the whole decode becomes hash-checkable in
    DuckDB via sha256 + hex arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "digest",
        "width",
        "height",
        F.array_join(
            F.transform(
                "feat",
                lambda x: F.round(x.cast("double") * 255).cast("int"),
            ),
            ",",
        ).alias("feat_bytes"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id, octet_length(encode(text)) / 100.0 AS dur
        FROM documents
    ), fanout AS (
        SELECT doc_id,
               unnest(generate_series(0,
                   greatest(CAST(floor(dur / 1.0) AS INTEGER), 1) - 1))
                 AS frame_idx
        FROM media
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           frame_idx * 1.0 AS frame_ts_s
    FROM fanout
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out plan (JVM sequence+posexplode,
    one row per frame before any decode work). Oracle-backed: the
    fan-out arithmetic is plain doubles over the metadata duration,
    identical in both engines (the media_meta struct is projected
    away for the harness)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample_plan(attach_binary_payload(docs, modality="video"))
    return frames.select("doc_id", "frame_idx", "frame_ts_s")


@query(
    "multimodal_resize",
    oracle="""
    WITH d AS (
        SELECT doc_id, text, sha256(text) AS pd
        FROM documents
    ), dims AS (
        SELECT doc_id, text,
               CAST(concat('0x', substr(pd, 1, 4)) AS INTEGER) % 1920 AS w,
               CAST(concat('0x', substr(pd, 5, 4)) AS INTEGER) % 1080 AS h
        FROM d
    ), t AS (
        SELECT doc_id, text, w, h, greatest(w, h, 1) AS long_side
        FROM dims
    ), r AS (
        SELECT doc_id, text, w, h,
               CASE WHEN long_side <= 256 THEN greatest(w, 1)
                    ELSE greatest(CAST(floor(w * (256.0 / long_side))
                                       AS INTEGER), 1) END AS nw,
               CASE WHEN long_side <= 256 THEN greatest(h, 1)
                    ELSE greatest(CAST(floor(h * (256.0 / long_side))
                                       AS INTEGER), 1) END AS nh
        FROM t
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS orig_width,
           CAST(h AS INTEGER) AS orig_height,
           CAST(nw AS INTEGER) AS new_width,
           CAST(nh AS INTEGER) AS new_height,
           sha256(text || ':' || nw || 'x' || nh) AS resized_digest
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving image resize over binary payloads (Arrow-
    batched mapInPandas; pixel resample stubbed behind the
    ``resample_fn`` seam). Fully oracle-backed: the stub's dimension
    math (digest hex bytes mod 1920/1080, floor scale, never-upscale)
    and the resized digest (sha256 of payload + ':WxH' marker) are
    reproduced in DuckDB SQL."""
    from tms_etl_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    return resize_images(attach_binary_payload(docs), max_side=256)


@query(
    "multimodal_chunk_audio",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               octet_length(encode(text)) / 100.0 AS dur
        FROM documents
    ), fanout AS (
        SELECT doc_id, dur,
               unnest(generate_series(0,
                   greatest(CAST(ceil((dur - 1.0) / 9.0) AS INTEGER), 1) - 1))
                 AS chunk_idx
        FROM media
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           chunk_idx * 9.0 AS chunk_start_s,
           least(chunk_idx * 9.0 + 10.0, dur) AS chunk_end_s
    FROM fanout
    """,
)
def multimodal_chunk_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk fan-out plan (10 s chunks, 1 s overlap): one row
    per chunk window from the metadata duration — JVM sequence +
    posexplode, no Python, no payload copies. Oracle-backed: the
    window arithmetic is plain IEEE doubles over
    octet_length(payload)/100, identical in both engines."""
    from tms_etl_spark.operators.multimodal import chunk_audio_plan

    docs = load_table(spark, sf_dir, "documents")
    return chunk_audio_plan(
        attach_binary_payload(docs, modality="audio"), chunk_s=10.0, overlap_s=1.0
    )


@query(
    "multimodal_phash_neardup",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
           CAST((SELECT SUM(c * (c - 1) / 2) FROM (
                    SELECT COUNT(*) AS c FROM documents GROUP BY text
                )) AS BIGINT) AS n_exact_pairs,
           TRUE AS planted_recall_ok,
           TRUE AS exact_dup_complete
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection across the binary
    modality (operators.multimodal.perceptual_hash +
    phash_neardup_pairs): every payload gets a planted 3-byte
    in-place edit twin, and the banded hamming join must (a) recover
    >=90% of the planted twins (structural for <=3 flipped bits —
    pigeonhole over 4 bands — with slack for threshold cells the
    mean shift flips) and (b) find EVERY exact-duplicate payload
    pair (identical bytes => identical signature => shared bands,
    zero loss allowed). The oracle recomputes n_docs and the exact-
    duplicate pair count from the text column and pins the two
    booleans."""
    from tms_etl_spark.operators.multimodal import (
        perceptual_hash,
        phash_neardup_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    orig = d.select("doc_id", payload.alias("payload"))
    variant = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.overlay(payload, F.lit(b"zzz"), F.lit(11)).alias("payload"),
    )
    sigs = perceptual_hash(orig.unionByName(variant))
    pairs = phash_neardup_pairs(sigs, bands=4, max_hamming=6)

    n_docs = d.agg(F.count("*").cast("long").alias("n_docs"))
    planted = pairs.where(
        F.col("doc_b") == F.col("doc_a") + 1000000
    ).agg(F.count("*").cast("long").alias("planted_found"))
    dg = d.select("doc_id", F.md5("text").alias("dig"))
    expected_exact = (
        dg.groupBy("dig")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("n_exact_pairs")
        )
    )
    found_exact = (
        pairs.where(
            (F.col("doc_a") < 1000000) & (F.col("doc_b") < 1000000)
        )
        .join(dg.select(F.col("doc_id").alias("doc_a"), F.col("dig").alias("dig_a")), "doc_a")
        .join(dg.select(F.col("doc_id").alias("doc_b"), F.col("dig").alias("dig_b")), "doc_b")
        .where(F.col("dig_a") == F.col("dig_b"))
        .agg(F.count("*").cast("long").alias("found_exact"))
    )
    return (
        n_docs.crossJoin(planted)
        .crossJoin(expected_exact)
        .crossJoin(found_exact)
        .select(
            "n_docs",
            "n_exact_pairs",
            (
                F.col("planted_found")
                >= F.round(F.col("n_docs") * 0.9).cast("long")
            ).alias("planted_recall_ok"),
            (F.col("found_exact") == F.col("n_exact_pairs")).alias(
                "exact_dup_complete"
            ),
        )
    )
