"""Plan audit: dump `.explain("formatted")` for the headline queries
plus an automated checklist of the plan properties that matter at
100 TB — pushed filters, pruned read schemas, broadcast joins,
partial aggregation, bounded top-k, whole-stage codegen spans.

Writes PLANS_r{N}.md (pass the round as argv[1], default "X") so the
plan evidence ships with the round's BENCH/CORRECTNESS artifacts.
`tests/test_plans.py` asserts the same properties; this script makes
them human-reviewable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tms_etl_spark import catalog
from tms_etl_spark.session import get_spark

AUDIT = [
    (
        "q1_pricing_summary",
        ["PushedFilters", "partial_sum", "HashAggregate"],
        "scan filter pushed; map-side partial aggregation before the "
        "exchange (codegen asserted in tests/test_plans.py on the "
        "executed plan; AQE's pre-execution explain hides codegen ids)",
    ),
    (
        "join_broadcast_dim_chain",
        ["BroadcastHashJoin", "PushedFilters"],
        "dimension chain broadcasts (no shuffle of the fact side)",
    ),
    (
        "join_asof",
        ["Window", "Exchange"],
        "as-of via union+window: exactly one exchange on the key",
    ),
    (
        "sort_limit_topk",
        ["TakeOrderedAndProject"],
        "top-k compiles to bounded TakeOrdered, not a global sort",
    ),
    (
        "tms_upsert_merge",
        ["Exchange"],
        "merge shuffles on the key columns only",
    ),
    (
        "dedup_minhash_lsh",
        ["HashAggregate", "Exchange"],
        "signature build partial-aggregates before the band shuffle",
    ),
    (
        "stream_interval_join",
        ["Join", "Exchange"],
        "interval join keyed on the equi-column (broadcast at small "
        "SF, shuffle at scale); time predicate evaluated in the join",
    ),
    (
        "q6_revenue_change",
        ["PushedFilters", "HashAggregate"],
        "pure scan query: every predicate pushed, zero joins, "
        "map-side-combined single aggregate",
    ),
    (
        "q18_large_volume",
        ["HashAggregate", "BroadcastHashJoin"],
        "HAVING pre-aggregate shrinks the fact ~100x BEFORE any join; "
        "customer enrich broadcasts",
    ),
    (
        "epoch_shuffle",
        ["Window", "Exchange"],
        "global per-epoch rank via bucketed two-phase ordering — the "
        "corpus windows on (epoch, md5-prefix bucket), never on the "
        "2-value epoch alone; offsets ride a broadcast",
    ),
    (
        "sketch_count_min_topk",
        ["HashAggregate"],
        "CMS built as a DataFrame aggregation: partial HashAggregates "
        "are the mergeable partial sketches",
    ),
    (
        "feature_winsorize",
        ["HashAggregate"],
        "exact group quantiles from the (group, value) histogram — "
        "no corpus-sized window partitioned by the 5-value group key",
    ),
    (
        "q4_order_priority",
        ["LeftSemi", "HashAggregate"],
        "EXISTS compiles to LEFT SEMI (no orders duplication); the "
        "non-equi shipdate predicate rides the semi join",
    ),
    (
        "q19_disjunctive_revenue",
        ["BroadcastHashJoin", "PushedFilters"],
        "OR-of-ANDs across the join: single-table residuals extracted "
        "and pushed to both scans, dim broadcast, one fact pass",
    ),
    (
        "q22_dormant_customers",
        ["LeftAnti", "PushedFilters"],
        "scalar-subquery threshold broadcasts as a 1-row relation; "
        "the dormancy date filter reaches the orders scan before the "
        "anti join",
    ),
    (
        "events_sessionize",
        ["Window", "Exchange"],
        "lag-flag-cumsum sessionization: both windows share ONE "
        "user-key exchange (green again after the round-4 NTZ loader "
        "fix)",
    ),
    (
        "layout_hilbert_key",
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        "Hilbert key via two broadcast FSM-tile joins (fact side "
        "map-only, codegen'd) + bounded top-k",
    ),
    (
        "dedup_sorted_neighborhood",
        ["Window", "Exchange"],
        "SNM global rank computed bucketed (prefix buckets + "
        "broadcast offsets), window pairs via rank-offset equi-join",
    ),
    (
        "sketch_theta_setops",
        ["HashAggregate"],
        "theta sketches as partial-aggregable state; set algebra on "
        "kilobyte sketches, exact counts in the same plan",
    ),
    (
        "basket_pairs_topk",
        ["TakeOrderedAndProject", "HashAggregate"],
        "co-purchase self-join co-partitioned on l_orderkey (pair "
        "fan-out bounded by basket size, never corpus-quadratic); "
        "top-20 bounded",
    ),
    (
        "graph_triangle_count",
        ["Scan ExistingRDD"],
        "degree-oriented triangle census: orientation bounds any "
        "node's out-degree at O(sqrt(E)), so the wedge join survives "
        "power-law hubs. Since r14 the 1-row census is materialized "
        "inside the operator (checkpoint pins released, zero "
        "residue), so the RETURNED plan is a local relation; the "
        "compute-plan evidence lives in plans/r14/ and the r13 "
        "before/after dumps",
    ),
    (
        "graph_pagerank_topk",
        ["Scan ExistingRDD"],
        "5 static PageRank rounds, each one node-keyed join + "
        "DECIMAL-exact sum over the deg-fused co-partitionable edge "
        "checkpoint (r14). The entry materializes its top-20 and "
        "releases the operator pins, so the RETURNED plan is a local "
        "relation; the iteration-plan evidence lives in "
        "plans/r14/graph_pagerank_inner_*.txt",
    ),
    (
        "rolling_active_users",
        ["BroadcastHashJoin", "HashAggregate"],
        "sliding distinct via map-side explode to window-end days + "
        "broadcast day-dim hash join (no nested-loop range join)",
    ),
    (
        "cohort_retention",
        ["HashAggregate", "Exchange"],
        "first-event agg and join both keyed on user_id (one large "
        "exchange); final rollup is weeks-x-weeks tiny",
    ),
    (
        "drift_chi_square",
        ["HashAggregate", "Window"],
        "one corpus scan -> bin counts; totals via window over the "
        "bins table, chi-square terms DECIMAL-summed",
    ),
    (
        "ivm_join_delta",
        ["BroadcastHashJoin"],
        "delta rule: both maintenance joins carry the small delta "
        "side and broadcast — history never re-joins history",
    ),
    (
        "ivm_retract_delta",
        ["HashAggregate", "Exchange"],
        "delete batch as negated states; merge is one key-grouped "
        "re-aggregation over state tables, O(keys)",
    ),
    (
        "multimodal_phash_neardup",
        ["HashAggregate", "Exchange"],
        "banded hamming join on (band, bits) keys — candidate "
        "generation is a digest-keyed shuffle, never all-pairs",
    ),
    (
        "join_skew_salted",
        ["__salt", "Generate"],
        "probe-side salt + exploded build-side replication: the join "
        "runs on (orderkey, salt), spreading a hot key over 8 "
        "reducers; proven result-identical to the unsalted join",
    ),
    (
        "ts_ewma_decay",
        ["Window", "hashpartitioning(user_id"],
        "16 lag expressions fused into one Window node over one "
        "user-key exchange — no self-join, no row expansion",
    ),
    (
        "path_markov_transitions",
        ["Window", "HashAggregate"],
        "LEAD pairs on the single user-key exchange; row "
        "normalization windows over the (types x types) grid only",
    ),
    (
        "dedup_semantic",
        ["MapInPandas", "FlatMapGroupsInPandas"],
        "cell assignment is a map pass (MapInPandas, no shuffle); "
        "the drop decision is one cell-keyed applyInPandas",
    ),
    (
        "text_lm_coverage",
        ["HashAggregate", "Exchange"],
        "frequent-bigram set is df-cut and vocabulary-bounded; the "
        "doc-gram stream joins it once",
    ),
    # round-9: the r4 verdict's single-partition top-k seams, fixed
    (
        "sim_cosine_topk_exact",
        ["TakeOrderedAndProject"],
        "exact-cosine ranking is a distributed top-k heap, NOT a "
        "row_number over an unpartitioned window (r4 scale-killer, "
        "fixed; absence of Exchange SinglePartition pinned in tests)",
    ),
    (
        "retrieval_rrf_fusion",
        ["TakeOrderedAndProject"],
        "the _exact_rerank feeding RRF now ranks via TakeOrdered; "
        "the RRF rank windows run over k-row candidate lists only",
    ),
    (
        "eval_retrieval_rank",
        ["BroadcastHashJoin"],
        "rank-free MRR: best relevant doc per query via max-by "
        "aggregation broadcast back; no Window node in the plan",
    ),
    (
        "rfm_segmentation",
        ["hashpartitioning(__b"],
        "quintile thresholds from the shared bucketed histogram "
        "(local windows per range bucket + broadcast offsets); no "
        "global window over the value-grain histogram",
    ),
    (
        "feature_quantile_bin",
        ["hashpartitioning(__b"],
        "decile thresholds ride the same bucketed engine; 1-row "
        "threshold table broadcasts, rows score map-side",
    ),
    (
        "eval_auc",
        ["hashpartitioning(__b"],
        "AUC numerator is integer arithmetic over the score value "
        "grain with bucketed cumulative negative counts",
    ),
    (
        "sample_uniform_hashorder",
        ["TakeOrderedAndProject"],
        "deterministic md5-order sample is a distributed top-k",
    ),
    (
        "agg_median_bucketed",
        ["hashpartitioning(__b"],
        "exact median read off the bucketed cumulative histogram — "
        "no global sort, no per-partition value buffering",
    ),
    (
        "agg_median_per_group",
        ["hashpartitioning(l_returnflag"],
        "grouped medians window on (group, bucket), never the group "
        "alone — a corpus-sized group stays spread over tasks",
    ),
    (
        "agg_percentiles_per_group",
        ["hashpartitioning(l_returnflag"],
        "nearest-rank p50/p90/p99 by integer rank logic over the "
        "same grouped bucketed histogram",
    ),
    (
        "join_asof_nearest",
        ["Window"],
        "both directional candidates from ONE key-partitioned sort "
        "(preceding + following frames); single shuffle",
    ),
    (
        "text_line_dedup",
        ["hashpartitioning(chunk"],
        "corpus-wide first-occurrence via min(struct) aggregation "
        "(map-side combined) — no chunk-partitioned window a "
        "boilerplate hot line could single-task",
    ),
    (
        "ts_ohlc_bars",
        ["min_by", "SortAggregate"],
        "open/close via min_by/max_by precedence structs — the "
        "struct-keyed buffer compiles to SortAggregate, still "
        "partial+final (two aggregate nodes) on one (type, hour) "
        "exchange",
    ),
    (
        "dedup_substring_spans",
        ["hashpartitioning(doc_a", "HashAggregate"],
        "islands windows partition by (pair, diagonal) — bounded by "
        "doc length, never corpus-wide; df-cut anchor join bounds "
        "the gram fan-out; partial aggregation everywhere",
    ),
    (
        "drift_ks",
        ["hashpartitioning(bkt", "HashAggregate"],
        "pooled-ECDF cumulative windows partition by value-range "
        "bucket; the only unpartitioned window runs over the "
        "metadata-sized bucket-count table (offsets, broadcast "
        "back); per-value counts partially aggregate map-side",
    ),
    (
        "join_interval_overlap",
        ["HashJoin", "partial_count"],
        "overlap self-join is an EQUI-join on the 7-day time tile "
        "(never CartesianProduct/nested-loop over the inequality); "
        "intervals explode to <=2 tiles array-side; cross-tile "
        "pairs deduped by the later-start tile rule, no distinct "
        "shuffle; priority rollup partial-aggregates",
    ),
    (
        "agg_skew_kurtosis",
        ["partial_sum", "HashAggregate"],
        "BIGINT power sums map-side combine on ONE group-key "
        "exchange; central moments are groups-sized IEEE arithmetic "
        "after the aggregate — bit-identical cross-engine, unlike "
        "the builtin float-accumulating skewness/kurtosis",
    ),
    (
        "eval_regression_metrics",
        ["BroadcastNestedLoopJoin", "partial_sum"],
        "the 1-row fitted model broadcasts back (BNLJ of a 1-row "
        "side = the broadcast-scalar pattern); both passes are "
        "map-side-combined aggregates; no per-row model shuffle",
    ),
    (
        "dedup_edit_distance",
        ["levenshtein", "HashAggregate"],
        "value-grain collapse (name types + counts) BEFORE the "
        "blocking equi-join; levenshtein is a post-join filter in "
        "codegen, never a join condition driving a nested loop",
    ),
    (
        "ts_autocorrelation",
        ["HashAggregate", "partial_count"],
        "corpus collapses to the (type, hour) grid in one "
        "partial-combining exchange and the grid is checkpointed "
        "(ONE corpus scan for four consumers); lag joins and "
        "per-type stats run on the calendar-bounded grid",
    ),
    (
        "topk_per_group_bounded",
        ["partial_", "HashAggregate"],
        "two-phase buffer-bounded top-k: per-(group, partition) "
        "k-slices then a flatten+slice merge — NO Window operator, "
        "no row_number; hot keys degrade into aggregation work",
    ),
    (
        "eval_ndcg",
        ["HashAggregate", "partial_"],
        "per-qid top-10 rides the bounded two-phase top-k; the only "
        "rank window runs over the 10-row-per-query result; DCG "
        "term sums ride DECIMAL",
    ),
    (
        "privacy_t_closeness",
        ["partial_count", "HashAggregate"],
        "two partial-combining corpus aggregates (class-band and "
        "global-band counts); EMD numerators are integer sums over "
        "the class x band grid; cumulative windows partition by "
        "class, the global cum runs on the bounded band domain",
    ),
    (
        "agg_weighted_median",
        ["partial_sum", "hashpartitioning"],
        "group-local value histogram with integer weight sums; "
        "nearest-rank pick is 2*cumw >= total_w — no per-group "
        "value buffer",
    ),
    # round-12: lakehouse read paths (the plans below are the READ
    # side of entries that first build a real versioned table — the
    # scan shape is what survives to 100 TB)
    (
        "lakehouse_read_pruned",
        ["Scan parquet", "partial_count"],
        "zonemap-pruned versioned read: the scan's file list is the "
        "manifest-pruned subset (plan-time skipping), residual "
        "filter + partial-combined aggregate on top",
    ),
    (
        "lakehouse_cdc_rowdiff",
        ["FullOuter", "Scan parquet"],
        "row-level CDC classify: ONE full-outer join on the key "
        "between the two file-bounded scopes; value compare is a "
        "struct equality in the join's projection, no second pass",
    ),
    (
        "lakehouse_text_search",
        ["array_contains", "Scan parquet"],
        "token-index-routed search: the scan reads only "
        "posting-admitted files; the residual containment predicate "
        "(array_contains over the shared tokenizer) keeps it exact",
    ),
    (
        "lakehouse_mv_incremental",
        ["Scan parquet"],
        "incremental multi-aggregate view read: groups-sized scan of "
        "the view table — the base is never touched at read time",
    ),
    # round-13: hive-partitioned versioned read — the scan should
    # plan ONLY the selected partition's files (manifest zonemap has
    # min==max on the partition column) and the partition value is
    # recovered from the path with the recorded type
    (
        "lakehouse_partition_pruned",
        ["Scan parquet", "partial_count"],
        "partition-pruned versioned read: the file list is one hive "
        "partition's files; residual equality filter + "
        "partial-combined aggregate on top",
    ),
    (
        "lakehouse_schema_evolution",
        ["Scan parquet", "partial_count"],
        "schema-evolved read: both version dirs scanned with the "
        "recorded schema (old files null-fill the added column "
        "reader-side); one partial-combined aggregate — no "
        "mergeSchema footer pass at read time",
    ),
    (
        "lakehouse_generated_partition",
        ["Scan parquet", "partial_count"],
        "generated-column partitioned read: p_day recovered from the "
        "hive paths (zero I/O) with the recorded string type; one "
        "partial-combined aggregate over the recovered column",
    ),
    (
        "lakehouse_spec_evolution",
        ["Scan parquet", "partial_count"],
        "spec-evolved read: the rewrite re-landed every row in the "
        "new hive spec; the scan is the new layout's files via "
        "basePath with the recorded schema",
    ),
    (
        "lakehouse_derived_pruning",
        ["Scan parquet", "partial_count"],
        "generated-partition predicate DERIVATION: the raw-ts range "
        "filter derives p_day bounds through the manifest's monotone "
        "generated-column expr, so the scan's file index holds only "
        "the boundary-inclusive day dirs (manifest pruning — the "
        "excluded days never reach the plan); the residual ts filter "
        "keeps rows exact, then one partial-combined aggregate",
    ),
    (
        "lakehouse_dpp_join",
        ["LeftSemi", "BroadcastHashJoin", "partial_count"],
        "manifest-level DPP: the filtered dimension's distinct keys "
        "prune the fact files driver-side BEFORE listing (the plan "
        "sees only surviving files), and the residual is a broadcast "
        "LEFT SEMI against the key set — no shuffle of the fact side "
        "for the join, one partial-combined aggregate after",
    ),
    (
        "lakehouse_scan_where",
        ["PushedFilters", "HashAggregate", "partial_count"],
        "SQL WHERE front door: simple conjuncts fix the file list at "
        "plan time (derived p_day predicate + zonemap + Bloom "
        "admission — pruned files never appear in the scan), the "
        "full predicate remains pushed as the row filter, and the "
        "aggregate partial-combines map-side",
    ),
    (
        "lakehouse_scan_where_or",
        ["PushedFilters", "HashAggregate", "partial_count"],
        "disjunction-aware skipping: a file is pruned only when EVERY "
        "disjunct group proves it empty, so the time-complement OR "
        "drops the middle day dirs from the plan's file index while "
        "the full OR predicate stays pushed as the row filter",
    ),
    (
        "lakehouse_optimize_where",
        ["HashAggregate", "partial_count"],
        "read after partition-scoped OPTIMIZE: the compacted "
        "partition scans its one new dir physically purged while the "
        "untouched partitions still read through the deletion "
        "vector's anti-join — mixed regimes in one scan, then one "
        "partial-combined aggregate",
    ),
    (
        "lakehouse_null_pruning",
        ["PushedFilters", "HashAggregate", "partial_count"],
        "IS NOT NULL over an evolved column: the backfilled per-file "
        "null counts drop every pre-evolution file from the plan's "
        "file index by metadata; the IsNotNull residual is pushed to "
        "the surviving scan, then one partial-combined aggregate",
    ),
    # round-16: the 28 previously property-less headline sections
    # (r8 VERDICT item 5) — every headliner now carries needles, so
    # a plan-shape regression FAILS the audit instead of printing
    (
        "join_sort_merge",
        ["SortMergeJoin", "partial_"],
        "explicit merge-join strategy: both sides exchange+sort on "
        "the key once, aggregate partial-combines after",
    ),
    (
        "agg_sum_avg_min_max",
        ["partial_sum", "partial_min"],
        "single scan, one group exchange; all eight aggregates "
        "partial-combine map-side (DECIMAL sums for exactness)",
    ),
    (
        "agg_rollup",
        ["Expand", "HashAggregate"],
        "rollup compiles to Expand (grouping-set replication) + one "
        "partial-combined aggregate — no per-level re-scan",
    ),
    (
        "window_cumulative",
        ["Window", "Exchange"],
        "running totals: ONE key exchange feeds the frame; no "
        "self-join, no per-row shuffle",
    ),
    (
        "topk_per_group",
        ["WindowGroupLimit"],
        "rank<=k filter pushes into WindowGroupLimit — per-partition "
        "group-local top-k BEFORE the exchange, so hot groups never "
        "ship their full history",
    ),
    (
        "stream_session_window",
        ["MergingSessions", "partial_"],
        "session windows compile to the MergingSessions operator "
        "with partial aggregation below the key exchange",
    ),
    (
        "dedup_exact",
        ["HashAggregate", "Exchange"],
        "exact dedup is a hash-keyed first-wins aggregate: partial "
        "map-side combine, ONE content-key exchange, no window",
    ),
    (
        "dedup_clusters",
        ["Scan ExistingRDD"],
        "iterative label propagation checkpoints each round (bounded "
        "lineage); the returned plan reads the CONVERGED labels — "
        "the iteration never re-executes per consumer",
    ),
    (
        "sim_cosine_topk",
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        "query vector broadcasts to the corpus scan; ranking is a "
        "distributed bounded top-k, never a single-partition window",
    ),
    (
        "sim_neardup_pairs_lsh",
        ["FlatMapGroupsInPandas", "HashAggregate"],
        "LSH candidate pairs come from band-bucket groups "
        "(applyInPandas per bucket) — bucketed, never all-pairs; "
        "verification aggregates partial-combine",
    ),
    (
        "sim_ivf_topk",
        ["MapInPandas", "TakeOrderedAndProject"],
        "cell assignment is an Arrow map pass (no shuffle); only "
        "probed cells scan; final ranking is bounded top-k",
    ),
    (
        "multimodal_feature_extract",
        ["MapInPandas", "Scan parquet"],
        "binary decode + feature extraction is ONE Arrow-batched "
        "map pass over the scan — zero exchanges in the plan",
    ),
    (
        "text_quality_score",
        ["Scan parquet", "Project"],
        "pure map-side scoring: scan + codegen'd projection, no "
        "exchange, no UDF — every heuristic is a builtin expression",
    ),
    (
        "text_winnow_fingerprint",
        ["ObjectHashAggregate", "Exchange"],
        "winnowing fingerprints aggregate array-side per doc "
        "(object hash agg, partial+final) on one doc-key exchange",
    ),
    (
        "quality_profile",
        ["HashAggregate", "Generate"],
        "two-level profile: per-column stats partial-combine, the "
        "report explodes from the 1-row aggregate (Generate) — the "
        "corpus is scanned once",
    ),
    (
        "ngram_lm_counts",
        ["BroadcastHashJoin", "HashAggregate"],
        "n-gram and (n-1)-gram count tables partial-combine; the "
        "probability join broadcasts the smaller context table",
    ),
    (
        "dedup_fuzzy_pairs",
        ["BroadcastHashJoin", "Window"],
        "sorted-neighborhood blocking: global rank via bucketed "
        "windows + broadcast offsets; candidate pairs by rank-offset "
        "equi-join, never corpus x corpus",
    ),
    (
        "q7_volume_shipping",
        ["BroadcastHashJoin", "partial_"],
        "snowflake star: every dimension chain broadcasts (zero "
        "fact-side join shuffles), final aggregate partial-combines",
    ),
    (
        "q13_customer_distribution",
        ["LeftOuter", "HashAggregate"],
        "outer join preserves order-less customers; both aggregation "
        "levels (per-customer, per-count) partial-combine",
    ),
    (
        "split_leakage_safe",
        ["BroadcastHashJoin", "HashAggregate"],
        "group-atomic split: the per-group assignment (content-hash "
        "aggregate) broadcasts back onto the corpus — duplicates "
        "can never straddle train/test",
    ),
    (
        "text_rarity_score",
        ["Generate", "BroadcastHashJoin"],
        "df-cut frequent-bigram table broadcasts; the doc-gram "
        "stream (Generate) joins it once, no gram-keyed shuffle of "
        "the corpus",
    ),
    (
        "dedup_incremental_bloom",
        ["LeftAnti", "Union"],
        "cross-snapshot dedup: new chunk anti-joins the prior "
        "snapshot's key digest (broadcastable), survivors union — "
        "the history is probed, never re-deduped",
    ),
    (
        "sim_pq_adc",
        ["MapInPandas", "TakeOrderedAndProject"],
        "PQ codes assigned in an Arrow map pass; ADC scoring is "
        "table lookups; ranking is a distributed bounded top-k",
    ),
    (
        "lakehouse_merge_state",
        ["Scan parquet", "partial_count"],
        "read after CoW MERGE: one scan of the surviving file set "
        "(rewritten + untouched files), no tombstone join — the "
        "merge purged physically; aggregate partial-combines",
    ),
    (
        "dedup_decontaminate",
        ["LeftSemi", "BroadcastExchange"],
        "benchmark decontamination: the eval-set n-gram table "
        "broadcasts into a LEFT SEMI against the corpus grams — "
        "one corpus pass, no corpus shuffle",
    ),
    (
        "sim_hard_negatives",
        ["SortAggregate", "BroadcastHashJoin"],
        "anchors broadcast to the corpus; per-anchor candidate "
        "ranking is a bounded struct-max aggregate (SortAggregate "
        "partial+final), never a global sort",
    ),
    (
        "lakehouse_tag_retention",
        ["Scan parquet", "partial_count"],
        "tag-resolved read after expire: ONE scan of the protected "
        "snapshot's files (manifest-planned — the overwritten head "
        "is a different file set), partial-combined aggregate",
    ),
    (
        "lakehouse_constraints",
        ["Scan parquet", "partial_count"],
        "read after a refused commit: the scan is the constrained "
        "v1 file set only (the violating dir was deleted pre-"
        "manifest), one partial-combined aggregate",
    ),
    # round-16 additions (new headliners this round)
    (
        "lakehouse_bloom_after_delete",
        ["LeftAnti", "Scan parquet"],
        "bloom-admitted point read UNDER deletion vectors: the scan "
        "plans only admitted files (sidecar probe at plan time) and "
        "the tombstone subtraction is an anti-join over that pruned "
        "set — one tombstone no longer demotes to a full scan",
    ),
    (
        "lakehouse_dpp_where",
        ["LeftSemi", "partial_count"],
        "one-scan DPP x WHERE: the file index is the INTERSECTION "
        "of the dim-key cut and the WHERE cut; residual = pushed "
        "row filter + broadcast LEFT SEMI; aggregate "
        "partial-combines",
    ),
    (
        "lakehouse_bucket_pruning",
        ["Scan parquet", "PushedFilters"],
        "bucket-transform point read: the IN values' hash images fix "
        "the file index to their bucket dirs at plan time; the IN "
        "predicate stays pushed to the surviving scan",
    ),
    (
        "lakehouse_type_widening",
        ["Scan parquet", "partial_count"],
        "widened read: both width generations scan under the ONE "
        "recorded wide schema (reader-side upcast, no rewrite, no "
        "mergeSchema footer pass); aggregate partial-combines",
    ),
    (
        "lakehouse_scan_where_not",
        ["PushedFilters", "partial_count"],
        "anti-equality skipping: NOT IN / NOT LIKE drop value-pure "
        "partition dirs from the file index; the full predicate "
        "stays pushed as the residual, aggregate partial-combines",
    ),
    (
        "lakehouse_nightly_maintain",
        ["PushedFilters", "Scan parquet"],
        "read after the one-call maintenance window: the compacted "
        "file set scans with the IN predicate pushed; the EXTENDED "
        "bloom sidecar admitted the files at plan time",
    ),
    (
        "lakehouse_minmax_metadata",
        ["Scan ExistingRDD"],
        "stats-only aggregate pushdown: the 1-row MIN/MAX/COUNT "
        "result materializes from manifest zonemaps alone — the "
        "returned plan is a local 1-row relation with NO parquet "
        "scan node (checked: 'Scan parquet' absent)",
    ),
    (
        "lakehouse_where_tag",
        ["Scan parquet", "partial_count"],
        "tag-resolved WHERE read: the scan is the TAGGED snapshot's "
        "pruned file list (predicate still drives manifest skipping "
        "on the older version), one partial-combined aggregate",
    ),
    (
        "lakehouse_merge_evolution",
        ["Scan parquet", "partial_count"],
        "read across the MERGE-evolution seam: untouched files, CoW "
        "survivors and wide source rows all scan under the ONE "
        "evolved recorded schema (reader-side upcast + null-fill, no "
        "mergeSchema footer pass); aggregate partial-combines",
    ),
    (
        "lakehouse_delete_where",
        ["PushedFilters", "partial_count"],
        "post-DELETE read: the residual predicate is pushed to the "
        "scan and the deletion vector applies as a broadcast-sized "
        "anti-join; the DELETE itself extracted keys from a "
        "zonemap-pruned scan, never a full-table pass",
    ),
    (
        "lakehouse_column_rename",
        ["PushedFilters", "partial_count"],
        "read across the rename seam: files scan under the stable "
        "PHYSICAL schema and alias to the logical name in the plan "
        "(no extra exchange); the WHERE on the renamed column still "
        "prunes via the remapped manifest stats and pushes to the "
        "scan",
    ),
    (
        "lakehouse_add_drop_column",
        ["Scan parquet", "partial_count"],
        "read across the add/drop seam: one scan under the recorded "
        "schema — pre-drop files null-fill the re-added column via "
        "its FRESH physical name (no resurrection), appended files "
        "supply it; aggregate partial-combines",
    ),
    (
        "lakehouse_merge_composite_key",
        ["Scan parquet", "partial_count"],
        "read after a tuple-keyed MERGE: the merge's zonemap cut was "
        "per key COLUMN, the probe/CoW joins keyed on (ok, ln), and "
        "the post-merge read is one plain scan + partial-combined "
        "aggregate — no surrogate concat key anywhere in the plan",
    ),
    (
        "lakehouse_merge_guarded",
        ["Scan parquet"],
        "read after a guarded MERGE (WHEN MATCHED AND cond): the "
        "guard evaluated per matched pair inside the CoW join during "
        "the merge; the returned snapshot read is a plain pruned "
        "scan — guard cost is paid once at merge time, never at read",
    ),
    (
        "lakehouse_merge_concurrent",
        ["Scan parquet", "partial_count"],
        "read after a conflict-checked concurrent MERGE (lost race, "
        "winner walked, disjointness proven, re-run landed): the "
        "returned snapshot read is a plain pruned scan with a "
        "partial-combined aggregate — conflict detection is manifest "
        "metadata only, invisible in the read plan",
    ),
    (
        "lakehouse_merge_sync_window",
        ["Scan parquet"],
        "read after a conditional NOT-MATCHED-BY-SOURCE merge "
        "(partial sync): the window condition joined the zonemap "
        "cut at merge time (stale files + key hits rewrite, fresh "
        "disjoint files never read); the returned read is a plain "
        "pruned scan",
    ),
    (
        "lakehouse_cdf_feed",
        ["Scan parquet"],
        "change-data-feed batch read: append steps scan their own "
        "data files, DML steps scan the write-time change sidecars "
        "— O(changed rows), never a snapshot diff; the plan is a "
        "union of plain parquet scans with constant change metadata",
    ),
    (
        "lakehouse_merge_full_sync",
        ["Scan parquet", "partial_count"],
        "read after a full-sync MERGE (NOT MATCHED BY SOURCE "
        "delete): the sync rewrote every live file BY DESIGN "
        "(documented O(table) clause); the read itself is one scan "
        "of the replaced snapshot with a partial-combined aggregate",
    ),
    (
        "lakehouse_update_where",
        ["Scan parquet"],
        "read after a predicate UPDATE (update_where, r13): the "
        "UPDATE copy-on-wrote only the zonemap-surviving files with "
        "matching rows (exact input_file_name probe); the returned "
        "snapshot read is a plain parquet scan — no residual "
        "filter/join machinery survives into the read plan",
    ),
    (
        "lakehouse_sql_merge",
        ["Scan parquet"],
        "read after the SQL-text MERGE (sql_dml parser lowered onto "
        "merge_version): identical physical story to the "
        "programmatic merge — the string front door adds zero plan "
        "overhead; the read is one scan of the merged snapshot",
    ),
    (
        "lakehouse_cdf_rename",
        ["Scan parquet", "partial_count"],
        "change-feed read across a RENAME seam: the pre-rename "
        "sidecar scans under its write-time (physical-identity) "
        "column, aliased to the end-version name in the projection "
        "— alignment is metadata-only, the plan stays a union of "
        "plain sidecar scans with a partial-combined aggregate",
    ),
    (
        "tms_monthly_report",
        ["partial_count", "Window"],
        "monthly report: decimal-exact weighted aggregate with "
        "map-side partial combine, then one window rank per month "
        "partition — a single shuffle on the group keys feeds both",
    ),
]


def audit_list() -> list[tuple[str, list[str], str]]:
    """The audited query list, DERIVED from bench.py's HEADLINE (so a
    new headliner can never skip audit — the r7 lakehouse_scan_where
    gap) plus every additionally-annotated non-headline query. Names
    with no annotation get an empty needle list: their plan is still
    dumped for review."""
    import bench

    by_name = {name: (needles, why) for name, needles, why in AUDIT}
    names = list(bench.HEADLINE)
    names += [n for n, _, _ in AUDIT if n not in set(names)]
    default = (
        [],
        "headliner without annotated plan properties — dumped for review",
    )
    return [(n, *by_name.get(n, default)) for n in names]


def main() -> None:
    round_tag = sys.argv[1] if len(sys.argv) > 1 else "X"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    catalog.load_all()
    spark = get_spark(app_name="plan_audit")

    import bench

    audits = audit_list()
    unknown = [n for n, _, _ in audits if n not in catalog.QUERIES]
    if unknown:
        raise SystemExit(f"audit names not in catalog: {unknown}")

    out = [
        f"# PLANS_r{round_tag} — physical-plan audit at {sf_dir}",
        "",
        "Checklist: every bench HEADLINE query (list derived from",
        "bench.py, so coverage is structural) plus additional",
        "annotated queries; scale properties asserted in",
        "tests/test_plans.py.",
        "",
    ]
    missing: list[str] = []
    unannotated: list[str] = []
    for name, needles, why in audits:
        df = catalog.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        hits = {n: (n in plan) for n in needles}
        missing += [f"{name}:{n}" for n, ok in hits.items() if not ok]
        if not needles:
            unannotated.append(name)
        out.append(f"## {name}")
        out.append(f"_{why}_")
        out.append("")
        out.append(
            "Properties: "
            + ", ".join(f"{n}={'OK' if ok else 'MISSING'}" for n, ok in hits.items())
        )
        out.append("")
        out.append("```")
        # keep the artifact reviewable: physical plan section only
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")

    path = f"PLANS_r{round_tag}.md"
    with open(path, "w") as f:
        f.write("\n".join(out))
    # self-check: every headliner has a section (structural, but
    # verified against the artifact so a regression is loud)
    body = "\n".join(out)
    unsectioned = [
        n for n in bench.HEADLINE if f"## {n}" not in body
    ]
    print(
        f"wrote {path}; missing properties: {missing or 'none'}; "
        f"headliners without needles: {unannotated or 'none'}; "
        f"headliners without a section: {unsectioned or 'none'}"
    )
    # a plan-shape regression (or a needle-less headliner) FAILS the
    # audit — since r9 this script is a gate, not just a dump
    if unsectioned or missing or unannotated:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
