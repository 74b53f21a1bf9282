"""r14 plan sweep: .explain("formatted") for EVERY headline bench
query (the same 81-entry list bench.py times, production overrides
included) + an automated audit over the dumps — Python-boundary
nodes, cartesian products, missing pushdowns. Mirrors the r13 sweep
so the round-over-round plan diff is greppable.

Usage: python scripts/capture_sweep_r14.py <out_dir>
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from tms_etl_spark import catalog  # noqa: E402
from tms_etl_spark.session import get_spark  # noqa: E402

out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14/sweep"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
os.makedirs(out_dir, exist_ok=True)

catalog.load_all()
spark = get_spark(app_name="sweep_r14")
overrides = bench._production_overrides()

audit = {"BatchEvalPython": {}, "ArrowEvalPython": {}, "MapInArrow": {},
         "FlatMapGroupsInPandas": {}, "CartesianProduct": {},
         "BroadcastNestedLoopJoin": {}}
for name in bench.HEADLINE:
    fn = overrides.get(name) or catalog.QUERIES[name]
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_cur.txt"), "w") as f:
        f.write(plan)
    for needle in audit:
        n = len(re.findall(rf"\b{needle}\b", plan))
        if n:
            audit[needle][name] = n
    # release anything the entry pinned (same hygiene as the bench)
    for jrdd in list(
        spark.sparkContext._jsc.getPersistentRDDs().values()
    ):
        jrdd.unpersist(False)
    print(f"wrote {name}")

print("\n== audit ==")
for needle, hits in audit.items():
    print(f"{needle}: {sum(hits.values())} across {len(hits)} queries "
          f"{sorted(hits) if hits else ''}")
spark.stop()
