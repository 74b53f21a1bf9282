"""Scale-pattern joins: the rewrites that keep a 100 TB join alive.

Three catalog entries, each proving a scale rewrite RESULT-IDENTICAL
to its naive form (the oracle runs the naive SQL; the engine runs
the rewritten plan — the gate hash-compares them):

- ``join_skew_salted``: hot-key-safe fact join via probe-side
  salting + bounded build-side replication.
- ``join_bloom_prefilter``: semi join where a packed Bloom filter
  drops non-matching fact rows MAP-SIDE before the shuffle, with an
  exact residual join killing the false positives.
- ``dedup_incremental_bloom``: cross-snapshot dedup where the
  no-false-negative Bloom guarantee routes definitely-new rows
  around the anti-join entirely.

Reference analog: the reference's first-write-wins duplicate guard
(/root/reference/src/main_01.py:520-536) re-expressed as
shuffle-minimizing distributed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import dsum, sql_dsum
from tms_etl_spark.sources.tables import load_table

_SALT = 8  # build-side replication factor; bounds hot-key fanout


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact join: the probe side (lineitem) gets a
    deterministic salt in [0, 8) from xxhash64(orderkey,
    linenumber), the build side (orders) is replicated once per salt
    value, and the join runs on (orderkey, salt) — so a hot orderkey
    that would pin one reducer is spread across 8 partitions, at
    the bounded cost of an 8x build-side replication (use when the
    probe side is the big one and its key histogram is heavy-tailed;
    AQE's skew handling covers moderate skew, salting covers the
    pathological key). The oracle runs the UNSALTED join — the gate
    proves the rewrite result-identical, which is the whole point:
    salting must never change the answer."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    salted_li = li.withColumn(
        "__salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT)).cast(
            "int"
        ),
    )
    replicated_od = od.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    joined = salted_li.join(
        replicated_od,
        (salted_li["l_orderkey"] == replicated_od["o_orderkey"])
        & (salted_li["__salt"] == replicated_od["__salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
    )


_BLOOM_M = 1 << 16
_BLOOM_DEPTH = 5


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_size >= 40
    )
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi join: the qualifying part keys build a
    packed Bloom filter (bounded metadata — m/8 bytes), every
    lineitem row tests it MAP-SIDE (JVM bit ops, zero exchange), and
    only the surviving sliver reaches the exact left-semi join that
    removes the false positives. No false negatives means no row is
    wrongly dropped — the residual join sees a fraction of the fact
    table instead of all of it, which at 100 TB is the difference
    between shuffling terabytes and shuffling gigabytes. (Spark's
    own runtime row-level filtering does this automatically for some
    shapes; this entry is the explicit, composable form usable on
    any key.) The oracle runs the plain IN-subquery — the gate
    proves the prefilter result-identical."""
    from tms_etl_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
        pack_bloom,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 40)
    keys = pt.select(F.col("p_partkey").alias("k")).distinct()
    words = pack_bloom(
        build_bloom(keys, "k", _BLOOM_M, _BLOOM_DEPTH), _BLOOM_M
    )
    probed = bloom_probe(words, li, "l_partkey", _BLOOM_M, _BLOOM_DEPTH)
    survivors = probed.where(F.col("bloom_hit")).drop("bloom_hit")
    exact = survivors.join(
        F.broadcast(keys),
        survivors["l_partkey"] == keys["k"],
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_lines"),
        dsum("l_extendedprice", "sum_price"),
    )


@query(
    "dedup_incremental_bloom",
    oracle="""
    WITH existing AS (
        SELECT DISTINCT md5(text) AS content_key
        FROM documents WHERE doc_id % 10 < 8
    ), incoming AS (
        SELECT doc_id, md5(text) AS content_key
        FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT i.doc_id, i.content_key
    FROM incoming i
    WHERE NOT EXISTS (
        SELECT 1 FROM existing e WHERE e.content_key = i.content_key
    )
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: which incoming documents
    (here: doc_id % 10 >= 8 as the new batch) are NOT already in the
    ingested corpus (the other 80%), keyed by content hash. The
    ingested side's keys pack into a Bloom filter; incoming rows
    that MISS it are definitely new (Bloom has no false negatives)
    and bypass the join entirely — only Bloom HITS (true dups plus
    the small false-positive sliver) reach the exact anti-join. At
    steady state almost everything incoming is new, so the anti-join
    input shrinks to ~the duplicate rate — the shape that makes
    daily re-crawl dedup affordable against a 100 TB corpus. Oracle:
    the plain NOT EXISTS — the gate proves the routing exact."""
    from tms_etl_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
        pack_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("text")).alias("content_key")
    existing = (
        docs.where(F.col("doc_id") % 10 < 8).select(key).distinct()
    )
    incoming = docs.where(F.col("doc_id") % 10 >= 8).select("doc_id", key)
    words = pack_bloom(
        build_bloom(existing, "content_key", _BLOOM_M, _BLOOM_DEPTH),
        _BLOOM_M,
    )
    probed = bloom_probe(
        words, incoming, "content_key", _BLOOM_M, _BLOOM_DEPTH
    )
    definite_new = probed.where(~F.col("bloom_hit")).select(
        "doc_id", "content_key"
    )
    candidates = probed.where(F.col("bloom_hit")).select(
        "doc_id", "content_key"
    )
    verified_new = candidates.join(existing, "content_key", "left_anti")
    return definite_new.unionByName(
        verified_new.select("doc_id", "content_key")
    )
