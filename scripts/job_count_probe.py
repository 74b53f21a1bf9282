"""Count Spark JOBS issued by one commit operation — evidence for the
round-13 commit-path work (footer stats fast path, fused MERGE source
aggregation, lazy delete pin). Fewer jobs = fewer passes over the
batch (guide §1.2).

Usage: python scripts/job_count_probe.py <repo_root> [sf_dir]
Prints job counts for: write_version (plain + hive), merge_version,
delete_where, optimize_version.
"""

from __future__ import annotations

import os
import sys
import tempfile

root = sys.argv[1] if len(sys.argv) > 1 else os.getcwd()
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from tms_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="job_count_probe", shuffle_partitions=8)
sc = spark.sparkContext
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

from tms_etl_spark.operators import versioned as vt  # noqa: E402
from tms_etl_spark.sources.tables import load_table  # noqa: E402

o = load_table(spark, sf_dir, "orders").select(
    F.col("o_orderkey").alias("ok"),
    F.col("o_orderstatus").alias("st"),
    F.col("o_totalprice").alias("price"),
)
o.write.format("noop").mode("overwrite").save()  # warm


def count_jobs(label, fn):
    sc.setJobGroup(label, label)
    fn()
    sc.setJobGroup(None, None)
    n = len(sc.statusTracker().getJobIdsForGroup(label))
    print(f"{label}: {n} jobs")
    return n


t1 = tempfile.mkdtemp(prefix="jcp_plain_")
count_jobs(
    "write_version_plain",
    lambda: vt.write_version(o.limit(50000), t1, "append"),
)

t2 = tempfile.mkdtemp(prefix="jcp_hive_")
count_jobs(
    "write_version_hive",
    lambda: vt.write_version(
        o.limit(50000).withColumn("b", F.col("ok") % 4),
        t2,
        "append",
        partition_by=["b"],
    ),
)

src = o.where(F.col("ok") % 7 == 0).withColumn("st", F.lit("u"))
count_jobs(
    "merge_version",
    lambda: vt.merge_version(spark, t1, src, key="ok"),
)

count_jobs(
    "delete_where",
    lambda: vt.delete_where(spark, t1, "price < 1000.0", key="ok"),
)

count_jobs(
    "optimize_version",
    lambda: vt.optimize_version(spark, t1),
)
spark.stop()
