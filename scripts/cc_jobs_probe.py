"""Jobs-per-round evidence for the r14 connected_components change.

The r13 shape ran TWO jobs per label-propagation round: the eager
localCheckpoint materialization and a limit(1) convergence count over
the cached blocks. Since r14 the checkpoint is lazy and the
convergence count's full scan materializes it — ONE job per round.

The probe runs connected_components on a chain graph that needs a
known number of rounds and prints total Spark jobs in the call
(setJobGroup-scoped), so before/after trees can be compared directly.

Usage: python scripts/cc_jobs_probe.py <repo_root>
"""

from __future__ import annotations

import os
import sys

root = sys.argv[1] if len(sys.argv) > 1 else os.getcwd()
sys.path.insert(0, root)

from tms_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="cc_jobs_probe", shuffle_partitions=4)
sc = spark.sparkContext

from tms_etl_spark.operators.graph import connected_components  # noqa: E402

# depth-12 chain: pointer jumping converges in ~4 rounds + 1
# confirming round — enough rounds for a stable per-round delta
edges = spark.createDataFrame(
    [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
)
edges.count()  # warm

sc.setJobGroup("cc_probe", "cc_probe")
cc = connected_components(edges)
n_out = cc.count()
sc.setJobGroup(None, None)
jobs = len(sc.statusTracker().getJobIdsForGroup("cc_probe"))
print(f"connected_components(depth-12 chain): {jobs} jobs total "
      f"(includes the final caller count), {n_out} labeled nodes")
spark.stop()
