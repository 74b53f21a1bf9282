"""Parquet table loading for the driver's synthetic star schema (S11).

Scans stay declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown + column pruning for free; at 100 TB these scans
are partition-pruned by the optimizer when queries filter on
partition-like columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor; used by
# query authors to decide join strategy hints.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The engine's timestamp semantics are UTC (DuckDB-oracle
    # compatible) regardless of who constructed the session — the
    # driver's verify harness builds its own SparkSession.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The driver's events table stores TIMESTAMP(NANOS) parquet,
        # which the vectorized reader rejects; read nanos as long and
        # convert with integer division (a double roundtrip would
        # lose µs precision at 1e18 magnitudes). Re-materialized
        # copies of events already carry a proper timestamp — only
        # convert when the raw read actually yields a long.
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return normalize_event_time(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Coerce a TIMESTAMP_NTZ event-time column to TIMESTAMP.

    Parquet written with ``timestamp[us]`` and no UTC-adjustment flag
    reads back as TIMESTAMP_NTZ, which breaks ``unix_micros`` and
    ``withWatermark`` (event time must be TIMESTAMP). The session tz
    is pinned UTC above, so the cast is a deterministic relabel, not
    a wall-clock shift. Applied at the loader seam once so every
    downstream operator (funnel, sessionize, streaming watermarks)
    sees a uniform event-time type.
    """
    if ts_col in df.columns:
        from pyspark.sql.types import TimestampNTZType

        if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    if not names:
        names = TABLE_NAMES
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API surface."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
