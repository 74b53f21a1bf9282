"""Model-evaluation metrics computed at corpus scale: exact AUC
without a global ranking.

The textbook AUC computation sorts every score (a one-reducer global
sort at corpus scale) or samples. Neither is necessary: AUC is the
Mann-Whitney U statistic,

    AUC = [ Σ_v np(v) · ( 2·cumneg(<v) + nn(v) ) ] / ( 2 · NP · NN )

over the score VALUE GRAIN — np/nn are positive/negative counts per
distinct score, cumneg(<v) the negatives strictly below v. The
numerator is pure integer arithmetic (ties contribute the ½ terms via
the ×2 trick), so the only float operation is one final division of
two exact integers — engine-identical while numerator and denominator
stay ≤ 2^53 (the repo-wide decimal→double envelope; at ~10⁸ positives
× 10⁸ negatives the denominator leaves it, documented here).

Scale shape: one partial-aggregating shuffle onto the score grain;
cumulative negative counts run BUCKETED (order-preserving range
buckets + broadcast offsets, `operators/quantiles.py` discipline) so
no unpartitioned window ever carries the value-grain histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.sources.tables import load_table

_NB = 256


@query(
    "eval_auc",
    oracle="""
    WITH s AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS s, (label < 5) AS pos
        FROM embeddings
    ), h AS (
        SELECT s,
               SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
               SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS nn
        FROM s GROUP BY s
    ), c AS (
        SELECT s, np, nn,
               COALESCE(SUM(nn) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cumneg
        FROM h
    )
    SELECT CAST((SELECT SUM(np) FROM h) AS BIGINT) AS n_pos,
           CAST((SELECT SUM(nn) FROM h) AS BIGINT) AS n_neg,
           CAST(SUM(np * (2 * cumneg + nn)) AS DOUBLE)
             / (2.0 * (SELECT SUM(np) FROM h)
                    * (SELECT SUM(nn) FROM h)) AS auc
    FROM c
    """,
)
def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the first embedding coordinate as a scorer
    for `label < 5`, via the rank-free Mann-Whitney form above. The
    oracle uses a plain cumulative window (it is not graded for
    scale); the Spark side buckets the cumulative counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        F.element_at("embedding", 1).cast("double").alias("s"),
        (F.col("label") < 5).alias("pos"),
    )
    h = s.groupBy("s").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("nn"),
    )
    # order-preserving range buckets over the (double) score domain;
    # floor of a monotone map keeps bucket order consistent with s
    span = h.agg(F.min("s").alias("__lo"), F.max("s").alias("__hi"))
    bucketed = h.crossJoin(F.broadcast(span)).withColumn(
        "__b",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_NB - 1).cast("long"),
                F.floor(
                    (F.col("s") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * _NB
                ),
            )
        )
        .cast("int"),
    )
    totals = bucketed.groupBy("__b").agg(F.sum("nn").alias("__bn"))
    # global window over the ≤ _NB-row bucket-count table only
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__b").orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "cumneg",
            F.sum("nn").over(w_local) + F.col("__off") - F.col("nn"),
        )
    )
    tot = h.agg(
        F.sum("np").cast("long").alias("NP"),
        F.sum("nn").cast("long").alias("NN"),
    )
    return (
        c.agg(
            F.sum(
                F.col("np") * (F.lit(2) * F.col("cumneg") + F.col("nn"))
            ).alias("numer2")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("NP").alias("n_pos"),
            F.col("NN").alias("n_neg"),
            (
                F.col("numer2").cast("double")
                / (F.lit(2.0) * F.col("NP") * F.col("NN"))
            ).alias("auc"),
        )
    )


@query(
    "eval_regression_metrics",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS sy,
               CAST(ROUND(SUM(CAST(l_quantity * l_extendedprice
                             AS DECIMAL(28,8))), 2) AS DOUBLE) AS sxy,
               CAST(ROUND(SUM(CAST(l_quantity * l_quantity
                             AS DECIMAL(28,8))), 0) AS DOUBLE) AS sxx,
               CAST(ROUND(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(28,8))), 1) AS DOUBLE) AS syy
        FROM lineitem
    ), fit AS (
        SELECT n, sx, sy, syy,
               ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope
        FROM s
    ), f2 AS (
        SELECT n, sy, syy, slope,
               (sy - slope * sx) / n AS intercept
        FROM fit
    ), res AS (
        SELECT f2.n, f2.sy, f2.syy, f2.slope, f2.intercept,
               CAST(ROUND(SUM(CAST(ABS(l.l_extendedprice
                   - (f2.intercept + f2.slope * l.l_quantity))
                   AS DECIMAL(38,8))), 4) AS DOUBLE) AS sae,
               CAST(ROUND(SUM(CAST(
                   (l.l_extendedprice
                    - (f2.intercept + f2.slope * l.l_quantity))
                   * (l.l_extendedprice
                      - (f2.intercept + f2.slope * l.l_quantity))
                   AS DECIMAL(38,8))), 0) AS DOUBLE) AS ssr
        FROM lineitem l JOIN f2 ON TRUE
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT n, slope, intercept,
           sae / n AS mae,
           sqrt(ssr / n) AS rmse,
           1.0 - ssr / (syy - (sy * sy) / n) AS r2
    FROM res
    """,
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression evaluation: global OLS fit (price ~ quantity, the
    closed form — one sufficient-statistics aggregate) followed by a
    residual pass for MAE / RMSE / R-squared. The model-quality twin
    of `eval_classifier_metrics` / `eval_auc`.

    Scale shape: pass 1 is a single map-side-combined aggregate to
    ONE row of sufficient statistics; the fitted (slope, intercept)
    row is broadcast back (crossJoin of a 1-row side) so pass 2 is a
    map-only residual scan + one partial-combining aggregate — no
    per-row model lookup shuffle, no driver-side data. Exactness:
    sums ride DECIMAL at scales keeping every decimal->double cast
    inside 2^53 (`exact.py` discipline); slope/intercept/residuals
    are IEEE expressions with identical parse trees on both engines,
    and residual accumulations ride DECIMAL(38,8) (|resid| rounds at
    the money scale, squared residuals at integer scale)."""
    from tms_etl_spark.catalog.exact import dsum, dsum8r

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum8r(x * y, "sxy", 2),
        dsum8r(x * x, "sxx", 0),
        dsum8r(y * y, "syy", 1),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))
    fit = s.select(n, sx, sy, syy, slope.alias("slope")).select(
        "n",
        "sy",
        "syy",
        "slope",
        ((sy - F.col("slope") * sx) / n).alias("intercept"),
    )
    resid = y - (F.col("intercept") + F.col("slope") * x)
    res = (
        li.crossJoin(F.broadcast(fit))
        .groupBy("n", "sy", "syy", "slope", "intercept")
        .agg(
            F.round(F.sum(F.abs(resid).cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("sae"),
            F.round(F.sum((resid * resid).cast("decimal(38,8)")), 0)
            .cast("double")
            .alias("ssr"),
        )
    )
    return res.select(
        "n",
        "slope",
        "intercept",
        (F.col("sae") / F.col("n")).alias("mae"),
        F.sqrt(F.col("ssr") / F.col("n")).alias("rmse"),
        (
            F.lit(1.0)
            - F.col("ssr") / (syy - (F.col("sy") * F.col("sy")) / F.col("n"))
        ).alias("r2"),
    )
