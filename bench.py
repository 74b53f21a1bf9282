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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
