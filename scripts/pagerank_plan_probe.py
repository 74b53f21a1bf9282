"""Inner-plan evidence for the r14 pagerank restructure.

The catalog entry now materializes its top-20 inside the entry (and
releases the operator's pins), so the RETURNED plan is a local
relation — the optimization evidence lives in the plan of the lazy
rank vector the operator builds. This probe explains that inner plan
(5 iterations over the co-purchase edge list at sf0.01, same graph as
the catalog entry) and prints the Exchange/Sort/join-node census, so
the before/after claim is checkable without running the bench.

Usage: python scripts/pagerank_plan_probe.py <out_file>
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tms_etl_spark.session import get_spark  # noqa: E402

out_file = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(app_name="pagerank_plan_probe")

from tms_etl_spark.catalog.behavior import _copurchase_edges  # noqa: E402
from tms_etl_spark.operators.graph import pagerank  # noqa: E402
from tms_etl_spark.sources.tables import load_table  # noqa: E402

li = load_table(spark, sf_dir, "lineitem")
pins: list = []
ranks = pagerank(_copurchase_edges(li), "u", "v", iters=5, pins_out=pins)
plan = ranks._sc._jvm.PythonSQLUtils.explainString(
    ranks._jdf.queryExecution(), "formatted"
)
census = {
    name: len(re.findall(rf"\b{name}\b", plan))
    for name in (
        "Exchange",
        "Sort",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "Scan ExistingRDD",
    )
}
with open(out_file, "w") as f:
    f.write(f"node census: {census}\n\n{plan}")
print(f"wrote {out_file}: {census}")
spark.stop()
