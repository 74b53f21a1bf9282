"""End-to-end lakehouse pipeline demo — every layer of the engine in
one executable path, medallion-style:

    python3 scripts/pipeline_demo.py [work_dir]

1. BRONZE   raw documents parquet committed as a versioned table
            (time travel from the first byte).
2. SILVER   constraint-checked commit: rows violating the length
            contract divert to a quarantine table (dead-letter), the
            rest land versioned.
3. GOLD     canonical-representative dedup (keep best quality per
            normalized-prefix family) MERGEd copy-on-write.
4. VIEW     incrementally-maintained per-language SUM/COUNT view.
5. INDEX    per-file Bloom sidecar on doc_id; a point read scans
            only the admitting files.
6. SEARCH   inverted token sidecar on text; a keyword search scans
            only posting-admitted files.
7. REPLICA  row-level CDC: the gold table's version chain diffed
            (`read_version_rowdiff`) and applied downstream
            (`apply_rowdiff`) — the replica converges to gold.
8. AUDIT    history across all tables — the manifest trail IS the
            lineage record — plus a TIMESTAMP AS OF read.

Prints one JSON line per stage; exits 0 when every check holds."""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tms_etl_spark.session import get_spark
from tms_etl_spark.sources.tables import load_table
from tms_etl_spark.operators.versioned import (
    history,
    merge_version,
    read_version,
    write_version,
    write_version_checked,
)
from tms_etl_spark.operators.matview import refresh_sum_view
from tms_etl_spark.operators.bloomindex import (
    build_bloom_index,
    read_version_point,
)


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="pipeline_demo_"
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="pipeline_demo")
    bronze, silver, gold = (os.path.join(work, t) for t in
                            ("bronze", "silver", "gold"))
    dead, view = os.path.join(work, "dead"), os.path.join(work, "view")

    docs = load_table(spark, sf, "documents")
    # bronze lands hive-partitioned by source (identity partitioning —
    # per-source reads plan from manifest metadata alone)
    write_version(docs, bronze, "append", partition_by=["source"])
    from tms_etl_spark.operators.versioned import read_version_pruned

    one_src = read_version_pruned(spark, bronze, "source", "=", "src3")
    assert one_src.inputFiles() and all(
        "source=src3" in f for f in one_src.inputFiles()
    ), "partition pruning must plan only src3's files"
    print(json.dumps({
        "stage": "bronze",
        "rows": read_version(spark, bronze).count(),
        "partition_by": ["source"],
        "pruned_src3_rows": one_src.count(),
    }))

    write_version_checked(
        read_version(spark, bronze),
        silver,
        check_constraints=["n_chars >= 80", "lang IS NOT NULL"],
        quarantine_dir=dead,
    )
    n_silver = read_version(spark, silver).count()
    n_dead = (
        read_version(spark, dead).count()
        if os.path.isdir(os.path.join(dead, "_manifests"))
        else 0
    )
    print(json.dumps({"stage": "silver", "rows": n_silver, "quarantined": n_dead}))

    sdf = read_version(spark, silver)
    fam = F.md5(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5)
        )
    )
    enc = F.col("n_chars").cast("long") * F.lit(4294967296) + F.col("doc_id")
    keep = (
        sdf.withColumn("__fam", fam)
        .groupBy("__fam")
        .agg((F.max(enc) % F.lit(4294967296)).cast("long").alias("doc_id"))
        .select("doc_id")
    )
    canonical = sdf.join(keep, "doc_id", "left_semi")
    write_version(canonical, gold, "append")
    n_gold0 = read_version(spark, gold).count()
    # late correction arrives: MERGE one updated row copy-on-write
    fix = canonical.limit(1).withColumn("source", F.lit("corrected"))
    merge_version(spark, gold, fix, "doc_id", "update")
    print(json.dumps({"stage": "gold", "rows": n_gold0,
                      "post_merge": read_version(spark, gold).count()}))

    refresh_sum_view(spark, gold, view, ["lang"], "n_chars")
    mv_rows = read_version(spark, view).count()
    print(json.dumps({"stage": "view", "groups": mv_rows}))

    build_bloom_index(spark, gold, "doc_id")
    some_id = read_version(spark, gold).select("doc_id").head()[0]
    got = read_version_point(spark, gold, "doc_id", some_id)
    n_scanned = len(got.inputFiles())
    n_total = len(read_version(spark, gold).inputFiles())
    assert got.count() == 1
    print(json.dumps({"stage": "index", "files_scanned": n_scanned,
                      "files_total": n_total}))

    from tms_etl_spark.operators.textindex import (
        build_text_index,
        search_token,
    )

    build_text_index(spark, gold, "text")
    tok = (
        read_version(spark, gold)
        .select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .count()
        .orderBy("count", "t")
        .head()["t"]
    )
    hits = search_token(spark, gold, "text", tok)
    print(json.dumps({
        "stage": "search", "token": tok, "hits": hits.count(),
        "files_scanned": len(hits.inputFiles()),
        "files_total": n_total,
    }))

    from tms_etl_spark.operators.versioned import (
        apply_rowdiff,
        current_version,
        read_version_rowdiff,
    )

    replica = os.path.join(work, "replica")
    write_version(read_version(spark, gold, 1), replica, "append")
    feed = read_version_rowdiff(spark, gold, "doc_id", 1)
    apply_rowdiff(spark, replica, feed, "doc_id", txn_id="demo-cdc")
    same = (
        read_version(spark, replica)
        .exceptAll(read_version(spark, gold))
        .isEmpty()
        and read_version(spark, gold)
        .exceptAll(read_version(spark, replica))
        .isEmpty()
    )
    assert same
    print(json.dumps({
        "stage": "replica", "feed_rows": feed.count(),
        "converged": same,
        "replica_version": current_version(spark, replica),
    }))

    from tms_etl_spark.operators.versioned import read_version_asof
    import time

    asof_rows = read_version_asof(spark, gold, time.time()).count()
    trail = {
        t: [f"v{h.version}:{h.op}" for h in history(spark, os.path.join(work, t))]
        for t in ("bronze", "silver", "gold", "view", "replica")
    }
    print(json.dumps({"stage": "audit", "history": trail,
                      "asof_now_rows": asof_rows}))
    print(json.dumps({"stage": "done", "work_dir": work}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
