"""Multimodal catalog entries (rows-only: binary payload processing
has no SQL oracle; correctness is pinned by tests/test_multimodal.py
against locally computed digests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tms_etl_spark.catalog import query
from tms_etl_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample_plan,
)
from tms_etl_spark.sources.tables import load_table


@query("multimodal_feature_extract")  # binary pipeline: no SQL oracle
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched decode (stubbed codec) →
    per-item features. Rows-only check; digest determinism is
    test-asserted."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs))


@query("multimodal_frame_sample")  # binary pipeline: no SQL oracle
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out plan (JVM sequence+posexplode,
    one row per frame before any decode work)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(attach_binary_payload(docs, modality="video"))


@query("multimodal_resize")  # stubbed codec digest: no SQL oracle
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving image resize over binary payloads (Arrow-
    batched mapInPandas; pixel resample stubbed, dimension math and
    digest determinism test-pinned)."""
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
