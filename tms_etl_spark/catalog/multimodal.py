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
