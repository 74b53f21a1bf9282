"""Sinks (SURVEY.md §2.1 S8-S12).

S8 (MERGE) lives in ``operators.merge`` / ``tms.pipeline``; here:
partitioned CSV export (S9), append-mode JSON run-audit log (S10),
parquet (S11), and the driver-side Excel report (S12, import-gated).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_month_kind_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: the reference's export layout — one directory per
    (month, kind) partition of CSV files
    (/root/reference/src/main_02.py:194-390's server-side export,
    re-expressed as a partitioned write). Writers scale with
    partitions; set maxRecordsPerFile upstream for file sizing."""
    df.write.mode(mode).partitionBy("month", "kind").option(
        "header", True
    ).csv(path)


def append_audit_event(
    spark: SparkSession, path: str, run_id: str, step: str, status: str, detail: str = ""
) -> None:
    """S10: append-mode JSON audit log (the reference's timestamped
    run log, /root/reference/src/main_01.py:21-29, 918-959)."""
    now = _dt.datetime.now(_dt.timezone.utc).isoformat()
    row = [(now, run_id, step, status, detail)]
    spark.createDataFrame(
        row, "ts string, run_id string, step string, status string, detail string"
    ).coalesce(1).write.mode("append").json(path)


def read_audit_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path).orderBy(F.col("ts"))


def export_excel(df: DataFrame, path: str, max_rows: int = 100_000) -> bool:
    """S12: driver-side Excel report (the reference declares openpyxl
    but never uses it — requirements.txt:5; the engine completes the
    surface). Bounded: refuses to collect more than ``max_rows`` —
    Excel is a report sink, not a data sink. Returns False when
    openpyxl is unavailable (import-gated per environment contract).
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    n = df.count()
    if n > max_rows:
        raise ValueError(f"refusing Excel export of {n} rows (cap {max_rows})")
    df.toPandas().to_excel(path, index=False)
    return True
