"""Scaling probe: run headline queries against synthetic 1×/2×/4×
multiples of sf0.1 (union with key offsets, written to /tmp) and
print per-scale wall times. A plan that would die at 100 TB shows
super-linear growth here; the engine's headliners should track the
data size roughly linearly on fixed cores.

Usage: python scripts/scale_probe.py [q1_pricing_summary ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tms_etl_spark import catalog
from tms_etl_spark.session import get_spark
from tms_etl_spark.sources.tables import TABLE_NAMES, load_table

def _count_java_procs() -> int:
    """Concurrent JVMs on the box (other Spark sessions skew
    timings) — best-effort /proc scan, -1 when unreadable."""
    try:
        n = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as fh:
                    if fh.read().strip() == "java":
                        n += 1
            except OSError:
                continue
        return n
    except OSError:
        return -1


DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "join_sort_merge",
    "agg_sum_avg_min_max",
    "window_cumulative",
    "join_asof",
    "dedup_minhash_lsh",
    "sim_neardup_pairs_lsh",
    "dedup_exact",
    "text_winnow_fingerprint",
    "stream_interval_join",
    "quality_profile",
    # round-3 batch 4/5 heavyweights: global ordering, pre-agg join,
    # histogram quantiles, sessionization
    "epoch_shuffle",
    "q18_large_volume",
    "feature_winsorize",
    "events_sessionize",
    # round-3 batch 5 + IVM: per-group reservoir, mergeable partials
    "sample_per_group",
    "ivm_incremental_agg",
    # round-4: funnel shares sessionize's one-exchange shape
    "events_funnel",
    # round-4 additions: LM type-table counts, tile-join Hilbert,
    # SNM blocking + levenshtein scoring
    "ngram_lm_counts",
    "layout_hilbert_key",
    "dedup_fuzzy_pairs",
    # round-6 additions: behavioral analytics + triangle census +
    # per-doc rarity (bigram-join) — the new shuffle-heavy shapes
    "cohort_retention",
    "rolling_active_users",
    "basket_pairs_topk",
    "graph_triangle_count",
    "graph_pagerank_topk",
    "multimodal_phash_neardup",
    "text_rarity_score",
    # round-8 additions: salted skew join (8x build replication must
    # scale with the probe side), bloom-routed dedup, per-cell
    # semantic dedup, 16-lag EWMA window, LM-coverage bigram join
    "join_skew_salted",
    "dedup_incremental_bloom",
    "dedup_semantic",
    "ts_ewma_decay",
    "text_lm_coverage",
    "path_markov_transitions",
    # round-10 additions: diagonal-islands substring dedup, bucketed-
    # ECDF KS statistic, PQ encode+ADC (train cost included)
    "dedup_substring_spans",
    "drift_ks",
    "sim_pq_adc",
    # round-12 additions (VERDICT r5 item 5): the round-11 bench
    # headliners that had no probe rows
    "recs_covisit_time_decay",
    "privacy_t_closeness",
    "join_interval_overlap",
    # round-12 lakehouse write-path headliners: versioned commit +
    # CoW MERGE + read, and commit + inverted-index build + search —
    # the probe scales the WRITE side (merge candidate discovery,
    # posting build) with the data
    "lakehouse_merge_state",
    "lakehouse_text_search",
    "dedup_decontaminate",
    "sim_hard_negatives",
    # round-13 additions: hive-partitioned commit + partition-pruned
    # read (write side scales, pruned read side should stay ~one
    # partition), and schema-evolved append + null-filling read
    "lakehouse_partition_pruned",
    "lakehouse_schema_evolution",
    # round-14 (VERDICT r6 item 2): every bench HEADLINE query gets a
    # probe row — the entries below close the gap between HEADLINE
    # and this list (several are deliberately "boring" map-side or
    # broadcast shapes whose flat curves are the point), plus the
    # remaining lakehouse entries and the new derived-pruning read.
    "join_broadcast_dim_chain",
    "agg_rollup",
    "topk_per_group",
    "tms_upsert_merge",
    "stream_session_window",
    "dedup_clusters",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "multimodal_feature_extract",
    "text_quality_score",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "split_leakage_safe",
    "lakehouse_time_travel",
    "lakehouse_spec_evolution",
    "lakehouse_derived_pruning",
    "feature_quantile_bin",
    "eval_auc",
    "eval_regression_metrics",
    # round-14 headliners: DPP through a filtered dimension and the
    # WHERE front door (derived_pruning is listed above)
    "lakehouse_dpp_join",
    "lakehouse_scan_where",
]

# SCALE_GRAPH_KEYS=1: also shift l_partkey so the co-purchase GRAPH
# scales as disjoint copies. Without it the part-key space is fixed
# and the graph DENSIFIES discontinuously at 2× (every once-co-
# occurring pair crosses the ≥2 edge threshold) — a probe-harness
# data artifact, not a plan property; see SCALE.md graph section.
# Only valid for queries that never join the part dim (the graph
# family) — part-FK joins would lose matches under the shift.
_GRAPH_KEYS = os.environ.get("SCALE_GRAPH_KEYS") == "1"

# SCALE_SHIFT_TIME=1: shift each events copy's timestamps by one full
# span, so scaling GROWS THE TIME RANGE AT FIXED DENSITY instead of
# densifying a fixed range. This is the linear regime for time-tiled
# interval joins (`join_interval_overlap`): under densification the
# TRUE overlap-pair output grows quadratically with copies (every
# copy overlaps every other), so the default probe measures output
# growth, not plan growth — see SCALE.md. Only meaningful for
# queries keyed on event TIME; time-bucketed session/window queries
# with fixed calendar filters would see different data per copy.

KEY_OFFSETS = {
    "lineitem": (
        {"l_orderkey": 10_000_000, "l_partkey": 10_000_000}
        if _GRAPH_KEYS
        else {"l_orderkey": 10_000_000}
    ),
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000},
    # LLM-tier tables scale too (duplicated content is fine for a
    # wall-clock probe; key offsets keep ids unique)
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


_SHIFT_TIME = os.environ.get("SCALE_SHIFT_TIME") == "1"

# time column shifted per copy under SCALE_SHIFT_TIME (one full span
# + a week of clearance, so copies can never overlap in time)
_TIME_COLS = {"events": "ts", "orders": "o_orderdate"}


def build_scaled(spark, base_dir: str, out_dir: str, mult: int) -> None:
    for t in TABLE_NAMES:
        df = load_table(spark, base_dir, t)
        span_sec, tcol = 0, _TIME_COLS.get(t)
        if _SHIFT_TIME and tcol and mult > 1:
            b = df.agg(
                F.min(tcol).alias("lo"), F.max(tcol).alias("hi")
            ).head()
            span_sec = (
                int((b["hi"] - b["lo"]).total_seconds()) + 7 * 86400
            )
        if t in KEY_OFFSETS and mult > 1:
            parts = [df]
            for i in range(1, mult):
                shifted = df
                for col, off in KEY_OFFSETS[t].items():
                    shifted = shifted.withColumn(col, F.col(col) + i * off)
                if span_sec:
                    shifted = shifted.withColumn(
                        tcol,
                        F.col(tcol)
                        + F.expr(f"INTERVAL {i * span_sec} SECONDS"),
                    )
                parts.append(shifted)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df  # dims stay fixed (realistic: dims don't scale with facts)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # coverage is structural (r8): every bench HEADLINE query gets a
    # probe row even if this hand-ordered list lags a new headliner
    from bench import HEADLINE

    seen = set(DEFAULT_QUERIES)
    default = DEFAULT_QUERIES + [n for n in HEADLINE if n not in seen]
    names = sys.argv[1:] or default
    catalog.load_all()
    # The probe measures PRODUCTION operators, same as bench.py: a few
    # catalog entries wrap their operator in the in-query agreement
    # harness (bounded exact twins for the DuckDB oracle), whose fixed
    # cost would swamp the scaling signal.
    from bench import _production_overrides

    overrides = _production_overrides()
    spark = get_spark(app_name="scale_probe")
    spark.range(1_000_000).groupBy((F.col("id") % 7)).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # Per-query warm-up at 1×: codegen/compile cost otherwise lands
    # entirely on the 1× measurement and fakes a sub-linear curve.
    for n in names:
        fn = overrides.get(n) or catalog.QUERIES[n]
        fn(spark, base).write.format("noop").mode("overwrite").save()

    # SCALE_MULTS extends the curve (e.g. "1,2,4,8"): the 8× point
    # separates fixed overhead (job submit, codegen, partition floor)
    # from data-dominated growth — in the saturated regime doubling
    # data should ~double time, and a 1×→4× ratio inflated by a tiny
    # 1× denominator shows up as a clean ~2× step from 4× to 8×.
    mults = [
        int(m)
        for m in os.environ.get("SCALE_MULTS", "1,2,4").split(",")
    ]
    # Session hygiene between runs (r13, same rationale as bench.py):
    # leaked localCheckpoint blocks from earlier queries otherwise
    # accumulate across the probe matrix and inflate LATE cells —
    # fatal for a scaling measurement, where the 8× cells run last.
    def _release_persisted() -> None:
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist(False)

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for mult in mults:
        scaled_dir = os.path.join(tempfile.gettempdir(), f"scale_probe_x{mult}")
        build_scaled(spark, base, scaled_dir, mult)
        for n in names:
            best = float("inf")
            for _ in range(2):  # best-of-2: shields against GC blips
                _release_persisted()  # untimed: drop dead blocks
                t0 = time.perf_counter()
                fn = overrides.get(n) or catalog.QUERIES[n]
                fn(spark, scaled_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[n][mult] = round(best, 3)
    _release_persisted()
    # recorded run conditions (r11, VERDICT r10 probe-hygiene ask):
    # the r10 artifact's 8×-points were inflated by machine contention
    # on identical code — probe-vs-probe comparisons need the load
    # context to stay honest. loadavg is sampled at END of run (the
    # probe itself dominates the 1-min figure; the 15-min figure
    # approximates background load across the run).
    conditions = {
        "cpus": os.cpu_count(),
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
        "spark_processes": _count_java_procs(),
    }
    print(
        json.dumps(
            {
                "base": base,
                "multiples": mults,
                "sec": results,
                "conditions": conditions,
            }
        )
    )


if __name__ == "__main__":
    main()
