"""Read-planning cost at HIGH hive-version-dir counts.

An append-heavy hive-partitioned table that is never compacted
accumulates one hive version dir per commit; `_read_files` must give
each its own ``basePath`` scan, so union arity grows with the commit
count even though ownership matching is O(paths). This probe measures
where that actually starts to hurt — and how completely one
`optimize_version` (what `maintain_table` runs automatically) removes
the cost — by synthesizing a table with N hive version dirs directly
(pyarrow files + one handcrafted manifest, format-identical to the
committed protocol) and timing plan construction and a full count
before and after compaction.

Usage: python scripts/hive_dirs_probe.py [N ...]   (default 100 500 1000)
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def synthesize(table_dir: str, n_dirs: int, rows_per_file: int = 10) -> int:
    """N single-file hive version dirs + one manifest referencing all
    of them, written with the same keys the real commit paths record."""
    from pyspark.sql import types as T

    total = 0
    dirs, hive_dirs, stats = [], [], {}
    for i in range(1, n_dirs + 1):
        d = f"data/v{i:06d}-t{i:08x}"
        part = f"p_k={i % 8}"
        os.makedirs(f"{table_dir}/{d}/{part}", exist_ok=True)
        lo = total
        tbl = pa.table(
            {"id": pa.array(range(lo, lo + rows_per_file), pa.int64())}
        )
        rel = f"{d}/{part}/part-00000.parquet"
        pq.write_table(tbl, f"{table_dir}/{rel}")
        total += rows_per_file
        dirs.append(d)
        hive_dirs.append(d)
        stats[rel] = {
            "__rows": rows_per_file,
            "id": [lo, lo + rows_per_file - 1],
            "p_k": [str(i % 8), str(i % 8)],
        }
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("p_k", T.StringType(), True),
        ]
    )
    man = {
        "version": n_dirs,
        "dirs": dirs,
        "hive_dirs": hive_dirs,
        "op": "append",
        "stats": stats,
        "recent_txns": [],
        "schema": json.dumps(schema.jsonValue()),
        "partition_by": ["p_k"],
        "committed_at": time.time(),
    }
    os.makedirs(f"{table_dir}/_manifests", exist_ok=True)
    with open(f"{table_dir}/_manifests/v{n_dirs:06d}.json", "w") as fh:
        json.dump(man, fh)
    return total


def probe(spark, n_dirs: int) -> dict:
    from tms_etl_spark.operators.versioned import (
        optimize_version,
        read_version,
        read_version_pruned,
    )

    root = tempfile.mkdtemp(prefix=f"hivedirs{n_dirs}_")
    t = f"{root}/tbl"
    expect = synthesize(t, n_dirs)

    t0 = time.perf_counter()
    df = read_version(spark, t)
    plan_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = df.count()
    count_s = time.perf_counter() - t0
    assert got == expect, (got, expect)

    # PRUNED read at high dir count: plan-time file lists come from
    # the manifest's stats keys (r8), so a selective read never lists
    # the store — this should stay near-constant in n_dirs, and the
    # point read touches exactly one file
    t0 = time.perf_counter()
    pruned = read_version_pruned(spark, t, "id", "=", expect - 1)
    n_files = len(pruned.inputFiles())
    plan_pruned_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got_p = pruned.count()
    count_pruned_s = time.perf_counter() - t0
    assert got_p == 1 and n_files == 1, (got_p, n_files)

    optimize_version(spark, t, partition_by=["p_k"])
    t0 = time.perf_counter()
    df2 = read_version(spark, t)
    plan_compacted_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    got2 = df2.count()
    count_compacted_s = time.perf_counter() - t0
    assert got2 == expect, (got2, expect)

    return {
        "n_hive_dirs": n_dirs,
        "rows": expect,
        "plan_s": round(plan_s, 3),
        "count_s": round(count_s, 3),
        "plan_pruned_s": round(plan_pruned_s, 3),
        "count_pruned_s": round(count_pruned_s, 3),
        "plan_compacted_s": round(plan_compacted_s, 3),
        "count_compacted_s": round(count_compacted_s, 3),
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100, 500, 1000]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("hive-dirs-probe")
        .getOrCreate()
    )
    try:
        for n in ns:
            print(json.dumps(probe(spark, n)), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
