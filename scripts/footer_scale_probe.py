"""Many-files evidence for the footer-stats fast path (r13/r14,
VERDICT r13 item 6): synthesize a commit with ~2000 small files and
time the footer walk (parallel, metadata-sized) against the Spark
aggregation fallback over the same directory — the claim under test
is that commit-time stats stay O(files x footer) driver work, not a
second O(batch) read, and that the walk's thread pool keeps the
per-file latency off the critical path.

Usage: python scripts/footer_scale_probe.py <repo_root> [n_files] [rows_per_file]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

root = sys.argv[1] if len(sys.argv) > 1 else os.getcwd()
n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
rows_per_file = int(sys.argv[3]) if len(sys.argv) > 3 else 10
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from tms_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="footer_scale_probe", shuffle_partitions=8)

import tms_etl_spark.operators.versioned as vt  # noqa: E402

tdir = tempfile.mkdtemp(prefix="footer_scale_")
rel = "data/v000001-probe"
# n_files tiny files, each with distinct bounds on a long, a double
# and a string column
df = (
    spark.range(n_files * rows_per_file)
    .select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("val_"), F.col("id")).alias("s"),
    )
    .repartition(n_files, "k")
)
df.write.parquet(f"{tdir}/{rel}")
import glob  # noqa: E402

actual = len(glob.glob(f"{tdir}/{rel}/*.parquet"))
schema = df.schema

t0 = time.perf_counter()
fast = vt._footer_file_stats(tdir, rel, schema)
t_fast = time.perf_counter() - t0
assert fast is not None, "fast path must engage on a flat local dir"

# aggregation path: call _dir_file_stats with the fast path disabled
orig = vt._footer_file_stats
vt._footer_file_stats = lambda *a, **k: None
try:
    t0 = time.perf_counter()
    slow = vt._dir_file_stats(spark, tdir, rel, schema=schema)
    t_slow = time.perf_counter() - t0
finally:
    vt._footer_file_stats = orig

assert fast == slow, "footer stats must be EXACTLY the aggregation's"
print(
    f"files={actual} footer_walk={t_fast:.3f}s "
    f"aggregation={t_slow:.3f}s speedup={t_slow / t_fast:.1f}x "
    f"(parity: exact, {len(fast)} entries)"
)
spark.stop()
