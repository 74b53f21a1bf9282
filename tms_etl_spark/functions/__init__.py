"""Engine scalar-function registry (SURVEY.md §4 "resolution rule
registering domain functions")."""

from tms_etl_spark.functions.domain import register_domain_functions

__all__ = ["register_domain_functions"]
