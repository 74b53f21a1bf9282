"""Capture `.explain("formatted")` for the round-13-touched queries.

Usage: python scripts/capture_plans_r13.py <repo_root> <out_dir> <suffix> [q...]

Runs each catalog fn (which for lakehouse entries BUILDS its table —
the explain is of the returned read plan) and writes
<out_dir>/<query>_<suffix>.txt. The bench must not be running (CPU
contention would not change plans, but table builds do real work).
"""

from __future__ import annotations

import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

from tms_etl_spark import catalog  # noqa: E402
from tms_etl_spark.session import get_spark  # noqa: E402

catalog.load_all()
spark = get_spark(app_name=f"plans_{suffix}")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
os.makedirs(out_dir, exist_ok=True)

for name in names:
    fn = catalog.QUERIES[name]
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
spark.stop()
