"""Recommendation / link-analysis catalog entries: item-item
collaborative-filtering similarity over basket co-occurrence, and
common-neighbor link prediction over the co-purchase graph.

Both build on the bounded candidate generators already in the engine
(``operators/corpus.py:cooccurrence_pairs`` with its per-basket cap,
``operators/graph.py`` with degree bounds) — the recommendation
workload is the consumer of the behavioral graph the round-6 family
constructs. Exactness: counts are longs; cosine = cooc /
(sqrt(c_a)·sqrt(c_b)) uses only IEEE-correctly-rounded ops (sqrt,
divide, multiply) on exact integers, so it is bit-deterministic
cross-engine with no decimal coercion needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_OP = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"

_EDGES = f"""
    op AS ({_OP}),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
"""


@query(
    "recs_item_cf_topk",
    oracle=f"""
    WITH op AS ({_OP}),
    pairs AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
               CAST(COUNT(*) AS BIGINT) AS cooc
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    item_n AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM op GROUP BY l_partkey
    )
    SELECT p.item_a, p.item_b, p.cooc,
           p.cooc / (sqrt(na.n) * sqrt(nb.n)) AS cosine
    FROM pairs p
    JOIN item_n na ON na.l_partkey = p.item_a
    JOIN item_n nb ON nb.l_partkey = p.item_b
    ORDER BY cosine DESC, p.item_a, p.item_b
    LIMIT 20
    """,
)
def recs_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al. 2001,
    binarized): the 20 part pairs with the highest co-occurrence
    cosine ``cooc/(sqrt(n_a)·sqrt(n_b))``, support ≥ 2. Plan: the
    basket self-join is the capped ``cooccurrence_pairs`` operator
    (one co-partitioned l_orderkey shuffle, C(max_basket,2) fan-out
    bound); per-item basket counts partial-aggregate onto part keys
    and join back onto the pair table on its own keys; ranking is
    TakeOrdered(20). At 100 TB the pair table — not the corpus — is
    the largest intermediate, and it is support-filtered before the
    normalization joins."""
    from tms_etl_spark.operators.corpus import cooccurrence_pairs

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey").where(
        F.col("n_baskets") >= 2
    )
    item_n = op.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n")
    )
    na = item_n.select(
        F.col("l_partkey").alias("item_a"), F.col("n").alias("n_a")
    )
    nb = item_n.select(
        F.col("l_partkey").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_baskets").alias("cooc"),
            (
                F.col("n_baskets")
                / (F.sqrt(F.col("n_a")) * F.sqrt(F.col("n_b")))
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "item_a", "item_b")
        .limit(20)
    )


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH {_EDGES},
    adj AS (
        SELECT u AS z, v AS n FROM edges
        UNION ALL SELECT v AS z, u AS n FROM edges
    ),
    deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY z),
    small AS (
        SELECT a.z, a.n, d.deg FROM adj a JOIN deg d USING (z)
        WHERE d.deg <= 64
    ),
    wedges AS (
        SELECT s1.n AS u, s2.n AS w, s1.deg
        FROM small s1 JOIN small s2 ON s1.z = s2.z AND s1.n < s2.n
    ),
    cand AS (
        SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn,
               CAST(ROUND(SUM(CAST(CAST(1.0 AS DOUBLE) / deg
                                   AS DECIMAL(28,8))), 6)
                    AS DOUBLE) AS ra
        FROM wedges GROUP BY u, w
    )
    SELECT c.u, c.w, c.cn, c.ra
    FROM cand c
    LEFT JOIN edges e ON e.u = c.u AND e.v = c.w
    WHERE e.u IS NULL
    ORDER BY c.cn DESC, c.ra DESC, c.u, c.w
    LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the support≥2 co-purchase graph: top-20
    non-edges by common-neighbor count, resource-allocation
    tie-break. Hub-bounded wedge generation (centers over deg 64
    excluded, identically in the oracle). See
    ``operators/graph.py:link_prediction_topk``."""
    from tms_etl_spark.catalog.behavior import _copurchase_edges
    from tms_etl_spark.operators.graph import link_prediction_topk

    li = load_table(spark, sf_dir, "lineitem")
    return link_prediction_topk(
        _copurchase_edges(li), "u", "v", k=20, max_hub_deg=64
    )


@query(
    "recs_covisit_time_decay",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
               epoch_us(ts) AS us
        FROM events
        WHERE props IS NOT NULL
    ),
    pairs AS (
        SELECT LEAST(a.item, b.item) AS item_a,
               GREATEST(a.item, b.item) AS item_b,
               CAST(FLOOR(ABS(a.us - b.us) / 60000000) AS BIGINT) AS gap_min
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.us < b.us
         AND b.us - a.us <= 3600000000
         AND a.item <> b.item
    )
    SELECT item_a, item_b,
           CAST(COUNT(*) AS BIGINT) AS n_covisits,
           CAST(SUM(CAST(1.0 / (1 + gap_min) AS DECIMAL(28,14)))
                AS DOUBLE) AS decayed_weight
    FROM pairs GROUP BY 1, 2
    ORDER BY decayed_weight DESC, item_a, item_b
    LIMIT 20
    """,
)
def recs_covisit_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed co-visitation (the classic covisit recsys edge,
    item2vec-era): items an engaged user touches within an hour get
    an edge weighted 1/(1 + minutes apart) — nearby co-visits count
    near 1, the hour boundary caps the fan-out. Scale shape: one
    user-keyed equi-join with the hour residual (per-user activity
    is bounded — the funnel family's shape), weights are IEEE on
    exact integer minute gaps, the per-pair accumulation rides
    DECIMAL(28,14), and top-20 compiles to TakeOrdered with the full
    (weight, item_a, item_b) tiebreak. The item key comes out of the
    JSON props column JVM-side (`get_json_object`)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("props").isNotNull()
    )
    e = ev.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.us") < F.col("b.us"))
        & (F.col("b.us") - F.col("a.us") <= 3600000000)
        & (F.col("a.item") != F.col("b.item")),
    ).select(
        F.least(F.col("a.item"), F.col("b.item")).alias("item_a"),
        F.greatest(F.col("a.item"), F.col("b.item")).alias("item_b"),
        F.floor(
            F.abs(F.col("a.us") - F.col("b.us")) / F.lit(60000000)
        )
        .cast("long")
        .alias("gap_min"),
    )
    w = (F.lit(1.0) / (F.lit(1) + F.col("gap_min"))).cast("decimal(28,14)")
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n_covisits"),
            F.sum(w).cast("double").alias("decayed_weight"),
        )
        .orderBy(F.desc("decayed_weight"), "item_a", "item_b")
        .limit(20)
    )
