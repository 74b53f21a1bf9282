"""Solo query timing probe (r13): per-query best-of-3 with warmup and
dead-block sweep, one process per tree -- the A/B harness used for
regression adjudication. Usage:
SPARK_GRAFT_SF_DIR=... python scripts/solo_probe.py <repo_root> <q1,q2,...>
"""
import os, sys, time
root = sys.argv[1]
names = sys.argv[2].split(',')
sys.path.insert(0, root)
from tms_etl_spark import catalog
from tms_etl_spark.session import get_spark
catalog.load_all()
spark = get_spark(app_name="solo_probe")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for name in names:
    fn = catalog.QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    runs=[]
    for _ in range(3):
        for jr in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jr.unpersist(False)
        t0=time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter()-t0)
    print("%-32s best %.2f  runs %s" % (name, min(runs), ["%.2f"%r for r in runs]))
spark.stop()
