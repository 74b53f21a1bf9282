"""Sources & sinks (SURVEY.md §2.1)."""

from tms_etl_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
