"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame program with (where SQL-expressible)
an equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables. The driver hash-compares the two at sf0.01 — this registry IS
the correctness surface.

Registration:

    @query("agg_sum", oracle="SELECT ...")
    def agg_sum(spark, sf_dir) -> DataFrame: ...

Exactness conventions (see ``tms_etl_spark.catalog.exact``):

- every computed column aliased identically on both sides;
- double aggregation goes through DECIMAL so the sum is exact and
  bit-identical regardless of partition/accumulation order — a plain
  ``SUM(double)`` differs between engines in the last ulps because the
  addition order differs, and at 100 TB partition order is never
  deterministic anyway;
- top-k queries always carry a unique tie-break key so the selected
  *set* of rows is well-defined.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Dict order IS the order the driver walks ``queries()`` — and the
# round-1 evidence file recorded exactly the FIRST 50 entries. These
# names go first: the flagship + every query CORRECTNESS_r01.json did
# not sample + everything added since. The remainder keeps module
# registration order; all of it has green round-1 driver evidence, so
# across rounds every query has driver-file coverage.
_DRIVER_PRIORITY = [
    # flagship + relational core (not in r01 driver file)
    "q1_pricing_summary", "scan_project_filter", "filter_null_coerce_json",
    "case_when_bucket", "string_functions", "date_functions",
    "month_normalize", "sort_limit_topk", "distinct_pairs",
    # TMS domain surface
    "tms_powered_off_filter", "tms_upsert_merge", "tms_first_write_wins",
    "tms_shift_summary", "tms_unpivot_pareto", "tms_top2_months",
    "tms_weighted_efficiency", "tms_sql_functions",
    # windows
    "window_latest_per_key", "window_rank_dense", "window_lag_lead",
    "window_rolling_range", "window_cumulative", "topk_per_group",
    "window_range_interval",
    # set ops
    "set_union_distinct", "set_intersect", "set_except",
    "set_intersect_all", "set_except_all",
    # streaming windows + time series
    "stream_tumbling_window", "stream_sliding_window", "stream_session_window",
    "stream_interval_join", "timeseries_resample_ffill",
    # similarity / ANN (incl. round-2 additions; rows-only
    # sim_cosine_topk is NOT here — its oracle-backed exact twin is,
    # and the agreement test pins the fast form to it)
    "sim_cosine_topk_exact", "sim_lsh_bucketed",
    "sim_neardup_pairs_exact", "sim_neardup_pairs_lsh", "sim_ivf_topk",
    "sim_quantize_int8",
    # llm-text entries without r01 driver rows + round-2 additions
    "dedup_jaccard_dfcut", "split_train_test", "dedup_clusters",
    "text_bpe_token_estimate", "text_winnow_fingerprint",
    # multimodal (frame_sample is deliberately NOT here: the priority
    # window is ~50 entries and its fan-out shape is already evidenced
    # by the oracle-backed chunk_audio; it keeps test + rows-only
    # coverage from its module-order slot)
    "multimodal_feature_extract",
    "multimodal_resize", "multimodal_chunk_audio",
    # data-quality suite (single-pass expectations)
    "quality_profile",
    # as-of variants (forward + tolerance, added round 2)
    "join_asof_forward",
]


def load_all() -> None:
    """Import every catalog module (populates QUERIES/ORACLES), then
    rebuild the registries so ``_DRIVER_PRIORITY`` names come first —
    the driver samples a prefix of ``queries()``, and this keeps that
    prefix pointed at the queries that most need fresh evidence."""
    from tms_etl_spark.catalog import (  # noqa: F401
        relational,
        tms_domain,
        windows,
        setops,
        stream_windows,
        similarity,
        llm_text,
        multimodal,
        aggregates,
        analytics,
        functions_ext,
        joins,
        joins_ext,
    )

    for reg in (QUERIES, ORACLES):
        ordered = {k: reg[k] for k in _DRIVER_PRIORITY if k in reg}
        ordered.update({k: v for k, v in reg.items() if k not in ordered})
        reg.clear()
        reg.update(ordered)


__all__ = ["QUERIES", "ORACLES", "query", "load_all"]
