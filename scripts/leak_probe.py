"""Leak evidence probe (r13): run checkpoint-using catalog queries in
one session and print the persistent-RDD count after each -- shows
whether superseded checkpoints leak. Usage: python scripts/leak_probe.py <repo_root>
"""
import os, sys
root = sys.argv[1]
sys.path.insert(0, root)
from tms_etl_spark import catalog
from tms_etl_spark.session import get_spark
catalog.load_all()
spark = get_spark(app_name="leak_probe")
sc = spark.sparkContext
sf_dir = "/root/testdata/sf0.01"
# r14: graph_triangle_count / graph_pagerank_topk added (VERDICT r13
# item 5) — both must now show ZERO residue without any bench sweep
# (the operator/entry releases its own pins on materializing its
# scalar result)
for name in ("dedup_clusters","dedup_minhash_lsh","lakehouse_merge_composite_key","text_bpe_encode","graph_triangle_count","graph_pagerank_topk"):
    fn = catalog.QUERIES.get(name)
    if fn is None: print(name,"absent"); continue
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    n = len(sc._jsc.getPersistentRDDs())
    print("%-32s persistent RDDs now: %d" % (name, n))
spark.stop()
