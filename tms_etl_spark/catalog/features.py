"""Feature-engineering catalog entries: smoothed / leave-one-out
target encoding of a categorical column, and the distributed
covariance–correlation matrix of the embedding column (XᵀX by
map-side pair fan-out).

Target encoding is the classic high-cardinality categorical
treatment for tabular training data (the smoothing form of the
CatBoost/Micci-Barreca estimator); the leave-one-out column is the
leakage-aware variant a training pipeline actually joins onto rows.
The covariance matrix is the sufficient statistic for PCA/whitening
— computed as a single map-side dim²/2 fan-out with partial
aggregation onto (i, j) keys, the standard scale shape for tall-
skinny XᵀX (shuffle volume is dim²-bounded, independent of rows).

Exactness: all sums ride DECIMAL (catalog/exact.py discipline);
float×float products are computed after exact float→double casts (a
24-bit × 24-bit significand product is exact in double); means,
covariances and correlations are fixed-parse-tree IEEE arithmetic,
with sqrt the only non-rational op (correctly rounded per IEEE-754).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_SMOOTH_M = 20


@query(
    "feature_target_encode",
    oracle=f"""
    WITH g AS (
        SELECT o_orderpriority AS cat,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ), p AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*) AS prior
        FROM orders
    )
    SELECT o.o_orderkey, g.cat,
           (g.s + CAST({_SMOOTH_M}.0 AS DOUBLE) * p.prior)
             / (g.c + {_SMOOTH_M}) AS enc_smooth,
           CASE WHEN g.c > 1
                THEN (g.s - o.o_totalprice) / (g.c - 1) END AS enc_loo
    FROM orders o
    JOIN g ON g.cat = o.o_orderpriority
    CROSS JOIN p
    """,
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-encode o_orderpriority against o_totalprice: the
    smoothed estimator (cat_sum + m·prior)/(cat_cnt + m), m=20, plus
    the per-row leave-one-out column (cat_sum − y)/(cat_cnt − 1) that
    excludes the row's own target (the leakage-safe join column).

    Plan: one corpus scan for the category stats (5 rows,
    map-side-combined), one for the global prior (1 row); both join
    back as broadcasts, so encoding the corpus is map-side — zero
    corpus-sized shuffles, the same shape at any scale. Category
    sums ride DECIMAL(18,4) (2-decimal money: midpoint-free)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    prior = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("prior")
    )
    return (
        o.join(
            F.broadcast(g), o["o_orderpriority"] == g["cat"]
        )
        .crossJoin(F.broadcast(prior))
        .select(
            "o_orderkey",
            "cat",
            (
                (F.col("s") + F.lit(float(_SMOOTH_M)) * F.col("prior"))
                / (F.col("c") + F.lit(_SMOOTH_M))
            ).alias("enc_smooth"),
            F.when(
                F.col("c") > 1,
                (F.col("s") - F.col("o_totalprice")) / (F.col("c") - 1),
            ).alias("enc_loo"),
        )
    )


@query(
    "embedding_covariance",
    oracle="""
    WITH comp AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), pairs AS (
        SELECT a.i AS i, b.i AS j,
               CAST(ROUND(SUM(CAST(a.x * b.x AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS sxy,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ), means AS (
        SELECT i,
               CAST(ROUND(SUM(CAST(x AS DECIMAL(28,14))), 8) AS DOUBLE)
                 / COUNT(*) AS m
        FROM comp GROUP BY i
    ), cov AS (
        SELECT p.i, p.j, p.n,
               p.sxy / p.n - mi.m * mj.m AS cov
        FROM pairs p
        JOIN means mi ON mi.i = p.i
        JOIN means mj ON mj.i = p.j
    ), diag AS (
        SELECT i, cov AS var FROM cov WHERE i = j
    )
    SELECT c.i, c.j, c.n, c.cov,
           CASE WHEN di.var > 0 AND dj.var > 0
                THEN c.cov / (sqrt(di.var) * sqrt(dj.var)) END AS corr
    FROM cov c
    JOIN diag di ON di.i = c.i
    JOIN diag dj ON dj.i = c.j
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance + correlation matrix of the embedding
    column (upper triangle, long form): the PCA/whitening sufficient
    statistic, computed the tall-skinny way — each row fans out its
    dim·(dim+1)/2 component products MAP-SIDE (a nested-transform
    expression, no self-join of the exploded table), then ONE
    partial-aggregating exchange onto the (i, j) key space (2080
    keys at dim 64). Shuffle volume is dim²-bounded — independent of
    row count — which is what makes XᵀX feasible at 100 TB; the
    oracle spells the same quantity as an exploded self-join, which
    is fine at sf0.01 and would be the wrong plan at scale.

    cov = E[xy] − E[x]E[y] from decimal-exact sums; corr divides by
    IEEE-sqrt'd diagonal variances (guarded for zero variance)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pair_expr = F.expr(
        "flatten(transform(embedding, (x, i) -> "
        "transform(slice(embedding, i + 1, size(embedding) - i), (y, j) -> "
        "struct(i AS i, i + j AS j, "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))"
    )
    pairs = (
        emb.select(F.explode(pair_expr).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(
            F.round(F.sum(F.col("p").cast("decimal(28,12)")), 8)
            .cast("double")
            .alias("sxy"),
            F.count("*").cast("long").alias("n"),
        )
    )
    comp = emb.select(F.posexplode("embedding").alias("i", "x")).select(
        "i", F.col("x").cast("double").alias("x")
    )
    means = comp.groupBy("i").agg(
        (
            F.round(F.sum(F.col("x").cast("decimal(28,14)")), 8).cast(
                "double"
            )
            / F.count("*")
        ).alias("m")
    )
    mi = means.select(F.col("i").alias("_mi"), F.col("m").alias("m_i"))
    mj = means.select(F.col("i").alias("_mj"), F.col("m").alias("m_j"))
    cov = (
        pairs.join(F.broadcast(mi), pairs["i"] == mi["_mi"])
        .join(F.broadcast(mj), pairs["j"] == mj["_mj"])
        .select(
            "i",
            "j",
            "n",
            (
                F.col("sxy") / F.col("n") - F.col("m_i") * F.col("m_j")
            ).alias("cov"),
        )
    )
    diag_i = cov.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("_di"), F.col("cov").alias("var_i")
    )
    diag_j = cov.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("_dj"), F.col("cov").alias("var_j")
    )
    return (
        cov.join(F.broadcast(diag_i), cov["i"] == diag_i["_di"])
        .join(F.broadcast(diag_j), cov["j"] == diag_j["_dj"])
        .select(
            "i",
            "j",
            "n",
            "cov",
            F.when(
                (F.col("var_i") > 0) & (F.col("var_j") > 0),
                F.col("cov")
                / (F.sqrt(F.col("var_i")) * F.sqrt(F.col("var_j"))),
            ).alias("corr"),
        )
    )


@query(
    "eval_calibration_bins",
    oracle="""
    WITH comp2 AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), cent AS (
        SELECT label AS cand_label, pos,
               CAST(ROUND(SUM(CAST(x AS DECIMAL(28,14))), 8) AS DOUBLE)
                 / COUNT(*) AS c
        FROM comp2 GROUP BY label, pos
    ), cnorm AS (
        SELECT cand_label,
               CAST(ROUND(SUM(CAST(c * c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nc
        FROM cent GROUP BY cand_label
    ), vnorm AS (
        SELECT vec_id,
               CAST(ROUND(SUM(CAST(x * x AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS nv
        FROM comp2 GROUP BY vec_id
    ), dots AS (
        SELECT comp2.vec_id, comp2.label, cent.cand_label,
               CAST(ROUND(SUM(CAST(comp2.x * cent.c AS DECIMAL(28,12))), 8)
                    AS DOUBLE) AS dot
        FROM comp2 JOIN cent ON cent.pos = comp2.pos
        GROUP BY comp2.vec_id, comp2.label, cent.cand_label
    ), cosed AS (
        SELECT d.vec_id, d.label, d.cand_label,
               d.dot / (sqrt(v.nv) * sqrt(c.nc)) AS cos
        FROM dots d
        JOIN vnorm v USING (vec_id)
        JOIN cnorm c USING (cand_label)
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, cand_label
               ) AS rk
        FROM cosed
    ), pred AS (
        SELECT vec_id, label, cand_label AS predicted, cos
        FROM ranked WHERE rk = 1
    ), binned AS (
        SELECT LEAST(CAST(FLOOR((cos + CAST(1.0 AS DOUBLE))
                                * CAST(5.0 AS DOUBLE)) AS INTEGER), 9)
                 AS bin,
               CASE WHEN predicted = label THEN 1 ELSE 0 END AS ok,
               cos
        FROM pred
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           CAST(SUM(ok) AS DOUBLE) / COUNT(*) AS accuracy,
           CAST(ROUND(SUM(CAST(cos AS DECIMAL(28,12))), 8) AS DOUBLE)
             / COUNT(*) AS mean_confidence
    FROM binned GROUP BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the nearest-centroid classifier: top
    cosine (the model's confidence, in [-1, 1]) bucketed into 10
    fixed bins, with per-bin accuracy and mean confidence — the
    calibration artifact (well-calibrated: accuracy tracks
    confidence). Reuses `embedding_label_outliers`'
    bit-deterministic predictions; binning is floor arithmetic on
    the already-exact cosine, so the whole table hash-matches. All
    post-prediction work reduces onto 10 bin keys map-side."""
    from tms_etl_spark.catalog.similarity import embedding_label_outliers

    pred = embedding_label_outliers(spark, sf_dir).select(
        "label",
        "predicted_label",
        F.col("best_cos").alias("cos"),
    )
    binned = pred.select(
        F.least(
            F.floor((F.col("cos") + F.lit(1.0)) * F.lit(5.0)).cast("int"),
            F.lit(9),
        ).alias("bin"),
        F.when(F.col("predicted_label") == F.col("label"), 1)
        .otherwise(0)
        .alias("ok"),
        "cos",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ok").cast("long").alias("n_correct"),
        (F.sum("ok").cast("double") / F.count("*")).alias("accuracy"),
        (
            F.round(F.sum(F.col("cos").cast("decimal(28,12)")), 8).cast(
                "double"
            )
            / F.count("*")
        ).alias("mean_confidence"),
    )


from tms_etl_spark.operators.quantiles import (  # noqa: E402
    sql_histogram_thresholds,
    sql_score,
)


@query(
    "feature_quantile_bin",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,4))) AS BIGINT)
                 AS price_unit
        FROM orders
    ),
    t AS ({sql_histogram_thresholds("base", "price_unit", 10)})
    SELECT b.o_orderkey, b.price_unit,
           {sql_score("b.price_unit", "t.t", 10)} AS decile
    FROM base b CROSS JOIN t
    """,
)
def feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of order totals — the standard
    numeric-feature discretization for tabular training data, exact
    and engine-identical (no `ntile` one-reducer sort, no float
    percentile interpolation). Thresholds come from the shared
    bucketed value-grain histogram (`operators/quantiles.py`); the
    1-row threshold table broadcasts and every row scores map-side
    with integer comparisons — the same pattern `rfm_segmentation`
    rides, generalized to q=10."""
    from tms_etl_spark.operators.quantiles import (
        histogram_quantile_thresholds,
        score_against_thresholds,
    )

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("long")
        .alias("price_unit"),
    )
    th = histogram_quantile_thresholds(base, "price_unit", 10, prefix="t")
    return base.crossJoin(F.broadcast(th)).select(
        "o_orderkey",
        "price_unit",
        score_against_thresholds("price_unit", "t", 10).alias("decile"),
    )


@query(
    "feature_string_index",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    )
    SELECT lang,
           n,
           CAST(dense_rank() OVER (ORDER BY n DESC, lang) - 1 AS INTEGER)
             AS label_index
    FROM counts
    """,
)
def feature_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic StringIndexer (frequencyDesc order, value
    tiebreak): the label→integer mapping table for categorical
    features, stable across runs/engines/partitionings — unlike
    MLlib's fit which depends on RDD aggregation order for ties. One
    partial-aggregating shuffle onto the label grid; the rank window
    runs over that bounded grid only. Rows join this map to encode;
    the map broadcasts."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("lang"))
    return counts.select(
        "lang",
        "n",
        (F.dense_rank().over(w) - 1).cast("int").alias("label_index"),
    )
