"""Generic columnar/text table IO (SURVEY.md §2.1 source/sink
breadth): one declarative reader/writer pair over Spark's built-in
format implementations — parquet (the lake default), ORC (the other
columnar), JSON lines and CSV (interchange). The reference hardcodes
CSV in + MariaDB/CSV out; an engine replacing it should speak the
standard lake formats without per-format code paths.

Format notes the tests pin:

- parquet/ORC round-trip all Spark types used by the engine
  (timestamps, decimals, arrays) bit-exactly and both support
  predicate pushdown + column pruning at scan time;
- JSON/CSV are TEXT formats: timestamps go through ISO strings, CSV
  needs an explicit schema on read (all-strings otherwise), and
  neither supports pushdown — they're interchange, not lake, formats.
  ``read_table`` therefore takes the expected schema for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

LAKE_FORMATS = ("parquet", "orc")
TEXT_FORMATS = ("json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``. CSV defaults to a header
    so the file is self-describing for humans (the schema still comes
    from the caller on read)."""
    if fmt not in LAKE_FORMATS + TEXT_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. For text formats pass ``schema`` —
    schema inference costs an extra full pass (JSON) or yields
    all-strings (CSV headers only name columns, they don't type
    them), neither acceptable on a 100 TB lake."""
    if fmt not in LAKE_FORMATS + TEXT_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    r = spark.read.format(fmt)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
