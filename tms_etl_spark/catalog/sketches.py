"""Mergeable-sketch catalog entries: Datasketches HLL distinct-count
(per-group sketches unioned into a corpus-wide estimate) and
Count-Min frequency estimation.

Reference analog: none — north-star surface. Sketches are THE
100 TB cardinality/frequency tool: fixed-size state, exact merge
(linear/mergeable), so Spark computes them as map-side partials and
unions kilobytes at the reducer instead of shuffling raw keys.

Gate strategy (same trick as ``agg_approx_distinct``): the sketch
estimate itself is engine-specific, so the query emits the EXACT
value (computed distributed, in the same plan) plus boolean
guarantees the estimate must satisfy; the DuckDB oracle reproduces
the exact values and pins the booleans TRUE. With fixed seeds both
sketches are deterministic, so a boolean that holds once holds every
run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

# HLL lgConfigK=14 → ~0.8% relative standard error; 3% is >3 sigma.
_HLL_LG_K = 14
_HLL_TOL = 0.03


@query(
    "sketch_hll_union",
    oracle=f"""
    WITH per AS (
        SELECT event_type AS scope,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    ), total AS (
        SELECT 'ALL' AS scope,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events
    )
    SELECT scope, exact_distinct, TRUE AS ok_rel_err
    FROM (SELECT * FROM per UNION ALL SELECT * FROM total)
    """,
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via Datasketches HLL, then the
    per-type sketches UNIONED (not recomputed) into the corpus-wide
    estimate — the mergeability that makes HLL a pre-aggregable cube
    metric: materialize one 16 KB sketch per (type, day) partition and
    any rollup is a union, never a rescan. The gate pins
    ``|est - exact| / exact <= 3%`` per scope plus the exact counts;
    the estimate is deterministic (fixed lgConfigK, no RNG)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.col("event_type").alias("scope")).agg(
        F.hll_sketch_agg("user_id", F.lit(_HLL_LG_K)).alias("sk"),
        F.count_distinct("user_id").cast("long").alias("exact_distinct"),
    )
    total = (
        per.agg(
            F.hll_union_agg("sk").alias("sk"),
        )
        .crossJoin(
            ev.agg(
                F.count_distinct("user_id").cast("long").alias("exact_distinct")
            )
        )
        .select(F.lit("ALL").alias("scope"), "sk", "exact_distinct")
    )
    unioned = per.select("scope", "sk", "exact_distinct").unionByName(total)
    est = F.hll_sketch_estimate("sk").cast("double")
    ok = (
        F.abs(est - F.col("exact_distinct"))
        / F.col("exact_distinct")
        <= F.lit(_HLL_TOL)
    )
    return unioned.select("scope", "exact_distinct", ok.alias("ok_rel_err"))


# Count-Min geometry: over-count ≤ (e / width) · N with probability
# 1 − 2^-depth per key. width 2048 → ~0.13% of N additive error.
_CMS_WIDTH = 2048
_CMS_DEPTH = 5


@query(
    "sketch_count_min_topk",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           TRUE AS ok_never_under,
           TRUE AS ok_additive_bound
    FROM events
    GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id
    LIMIT 20
    """,
)
def sketch_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequency from a Count-Min sketch built AS a
    DataFrame aggregation (`operators/cms.py` — the partial
    HashAggregates per partition are the mergeable partial sketches),
    probed for the exact top-20 heavy hitters in the same plan. The
    gate pins the two CMS guarantees as booleans: never under-counts,
    and over-counts by at most ``ceil(e/width · N)`` (deterministic
    under the fixed xxhash64 row-seeding). At 100 TB the d×w-row
    sketch table replaces shuffling a multi-billion-key column, and
    per-day sketches union+re-agg into coarser periods without
    rescanning raw data."""
    from tms_etl_spark.operators.cms import build_cms, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    cms = build_cms(ev, "user_id", _CMS_WIDTH, _CMS_DEPTH)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(20)
    )
    probed = cms_estimate(cms, top, "user_id", _CMS_WIDTH, _CMS_DEPTH)
    n_total = ev.count()
    import math

    bound = int(math.ceil(math.e / _CMS_WIDTH * n_total))
    return probed.select(
        "user_id",
        "exact_cnt",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("ok_never_under"),
        (F.col("cms_est") <= F.col("exact_cnt") + F.lit(bound)).alias(
            "ok_additive_bound"
        ),
    )


# Bloom geometry: ~52 members at sf0.01 → 4096 bits / 3 hashes keeps
# the observed FP rate well under 1%; the packed literal is 512 bytes.
_BLOOM_M = 4096
_BLOOM_K = 3


@query(
    "sketch_bloom_membership",
    oracle="""
    SELECT doc_id,
           (doc_id % 97 = 0) AS exact_member,
           TRUE AS ok_no_false_negative
    FROM documents
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership pre-filter: a Bloom filter built distributed over
    the held-out slice (doc_id % 97 = 0 — same eval set the
    decontamination check uses), packed into 64 longs and probed
    map-only across the whole corpus (`operators/bloom.py`). The gate
    pins the filter's defining guarantee per row: a true member is
    NEVER missed (``bloom_hit OR NOT exact_member``), with
    ``exact_member`` recomputed independently via a broadcast
    left-semi-style join, not the modulus shortcut. At 100 TB this is
    the decontamination shape that never shuffles the corpus: filter
    bits ride the broadcast, corpus stays map-side."""
    from tms_etl_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
        pack_bloom,
    )

    d = load_table(spark, sf_dir, "documents")
    members = d.where(F.col("doc_id") % 97 == 0).select("doc_id")
    words = pack_bloom(
        build_bloom(members, "doc_id", _BLOOM_M, _BLOOM_K), _BLOOM_M
    )
    probed = bloom_probe(words, d.select("doc_id"), "doc_id", _BLOOM_M, _BLOOM_K)
    member_flag = members.withColumn("__m", F.lit(True))
    return (
        probed.join(F.broadcast(member_flag), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__m"), F.lit(False)).alias("exact_member"),
            (
                F.col("bloom_hit")
                | ~F.coalesce(F.col("__m"), F.lit(False))
            ).alias("ok_no_false_negative"),
        )
    )


# Theta k=2^14 → ~0.8% RSE on estimation mode; 5% is generous.
_THETA_LG_K = 14
_THETA_TOL = 0.05


@query(
    "sketch_theta_setops",
    oracle="""
    WITH r AS (SELECT DISTINCT l_partkey FROM lineitem
               WHERE l_returnflag = 'R'),
         a AS (SELECT DISTINCT l_partkey FROM lineitem
               WHERE l_returnflag = 'A')
    SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_r,
           CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM r UNION
                                       SELECT * FROM a)) AS BIGINT)
             AS n_union,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM r INTERSECT
                                       SELECT * FROM a)) AS BIGINT)
             AS n_intersect,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM r EXCEPT
                                       SELECT * FROM a)) AS BIGINT)
             AS n_diff,
           TRUE AS ok_union, TRUE AS ok_intersect, TRUE AS ok_diff
    """,
)
def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count SET ALGEBRA via Datasketches theta sketches —
    the capability HLL lacks: |R ∩ A| and |R − A| of two key sets
    from their kilobyte sketches alone, no re-scan. At 100 TB this is
    how "users who did X but never Y" is answered from per-partition
    sketches. The gate computes the exact counts in the same plan and
    pins each estimate within 5% (theta is deterministic: fixed
    lgNomEntries, seed-stable hashing); the oracle recomputes the
    exact set sizes and pins the booleans TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R")
    a = li.where(F.col("l_returnflag") == "A")
    sk = (
        r.agg(F.theta_sketch_agg("l_partkey", F.lit(_THETA_LG_K)).alias("sr"))
        .crossJoin(
            a.agg(
                F.theta_sketch_agg("l_partkey", F.lit(_THETA_LG_K)).alias("sa")
            )
        )
        .select(
            F.theta_sketch_estimate(F.theta_union("sr", "sa")).alias("e_union"),
            F.theta_sketch_estimate(
                F.theta_intersection("sr", "sa")
            ).alias("e_intersect"),
            F.theta_sketch_estimate(
                F.theta_difference("sr", "sa")
            ).alias("e_diff"),
        )
    )
    rk = r.select("l_partkey").distinct()
    ak = a.select("l_partkey").distinct()
    exact = (
        rk.agg(F.count("*").cast("long").alias("n_r"))
        .crossJoin(ak.agg(F.count("*").cast("long").alias("n_a")))
        .crossJoin(
            rk.unionByName(ak)
            .distinct()
            .agg(F.count("*").cast("long").alias("n_union"))
        )
        .crossJoin(
            rk.intersect(ak).agg(
                F.count("*").cast("long").alias("n_intersect")
            )
        )
        .crossJoin(
            rk.exceptAll(ak)
            .distinct()
            .agg(F.count("*").cast("long").alias("n_diff"))
        )
    )

    def ok(est, exact_col):
        return (
            F.abs(F.col(est) - F.col(exact_col))
            <= F.greatest(
                F.lit(1.0), F.lit(_THETA_TOL) * F.col(exact_col)
            )
        )

    return exact.crossJoin(sk).select(
        "n_r",
        "n_a",
        "n_union",
        "n_intersect",
        "n_diff",
        ok("e_union", "n_union").alias("ok_union"),
        ok("e_intersect", "n_intersect").alias("ok_intersect"),
        ok("e_diff", "n_diff").alias("ok_diff"),
    )


# KLL k=200 → normalized rank error ~1.65% (one-sided); 5% is >3x.
_KLL_K = 200
_KLL_TOL = 0.05


@query(
    "sketch_kll_quantiles",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS ok_q25, TRUE AS ok_q50, TRUE AS ok_q75
    FROM lineitem
    """,
)
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles via Datasketches KLL: one sketch per
    return-flag group, MERGED (not recomputed) into the corpus-wide
    sketch, then queried at p25/p50/p75 — the pre-aggregable
    percentile metric (per-partition sketches union into any rollup;
    approx_percentile's state never leaves the plan). KLL estimates
    carry engine/run-specific compaction randomness, so the gate is
    the rank contract computed in-query: the exact rank of each
    estimated quantile (fraction of rows ≤ it, computed distributed)
    must sit within 5% of the target rank; the oracle recomputes the
    row count and pins the booleans TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice", F.lit(_KLL_K)).alias("sk")
    )
    merged = per.agg(F.kll_merge_agg_double("sk", F.lit(_KLL_K)).alias("sk"))
    est = merged.select(
        F.kll_sketch_get_quantile_double("sk", F.lit(0.25)).alias("q25"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.75)).alias("q75"),
    )
    joined = li.crossJoin(F.broadcast(est))
    agg = joined.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.avg(
            (F.col("l_extendedprice") <= F.col("q25")).cast("double")
        ).alias("r25"),
        F.avg(
            (F.col("l_extendedprice") <= F.col("q50")).cast("double")
        ).alias("r50"),
        F.avg(
            (F.col("l_extendedprice") <= F.col("q75")).cast("double")
        ).alias("r75"),
    )
    return agg.select(
        "n_rows",
        (F.abs(F.col("r25") - 0.25) <= _KLL_TOL).alias("ok_q25"),
        (F.abs(F.col("r50") - 0.5) <= _KLL_TOL).alias("ok_q50"),
        (F.abs(F.col("r75") - 0.75) <= _KLL_TOL).alias("ok_q75"),
    )


@query(
    "sketch_hll_sliding",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), d AS (SELECT DISTINCT day FROM du)
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau_exact,
           TRUE AS est_within_5pct
    FROM d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct via MERGEABLE sketches: one HLL
    sketch per day, unioned over a trailing 7-day window frame —
    the form that replaces `rolling_active_users`' explode+exact
    count when per-window exact distinct stops paying its shuffle
    bill (each day's kilobyte sketch is built once and reused by
    all 7 windows it participates in; window state is
    O(days x sketch), independent of user cardinality). The gate
    value-checks the EXACT trailing count and pins in-query that
    the sketch estimate lands within 5% of it at every day."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    est = daily.select(
        "day",
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sk) OVER ("
            "ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING "
            "AND CURRENT ROW))"
        ).alias("wau_est"),
    )
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    exact = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau_exact"))
    )
    return exact.join(est, "day").select(
        F.col("day").cast("timestamp").alias("day"),
        "wau_exact",
        (
            F.abs(F.col("wau_est") - F.col("wau_exact"))
            <= 0.05 * F.col("wau_exact")
        ).alias("est_within_5pct"),
    )
