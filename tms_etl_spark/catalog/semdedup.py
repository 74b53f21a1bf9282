"""Catalog entry for SemDeDup-style semantic deduplication
(`operators/semdedup.py`), verified with the in-query agreement
pattern the ANN entries established: the production per-cell BLAS
verdicts must match a decimal-exact within-cell recomputation, and
the oracle pins the agreement booleans TRUE while recomputing the
corpus size in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tms_etl_spark.catalog import query
from tms_etl_spark.catalog.exact import decimal_dot
from tms_etl_spark.sources.tables import load_table

_N_CELLS = 8
_TAU = 0.85


@query(
    "dedup_semantic",
    oracle=f"""
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_corpus,
           {_N_CELLS} AS n_cells,
           TRUE AS dup_of_below_id_ok,
           TRUE AS drops_match_exact
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv 2303.09540) over the
    embeddings table: hash-seeded IVF cells, within-cell cosine >=
    0.85 drops keeping the lowest-id representative.

    Oracle strategy (same as `sim_lsh_bucketed`): the cell ids are
    xxhash-derived (no DuckDB twin), so the driver pins the
    operator's exactness contract instead — the float-BLAS verdicts
    must equal a decimal-exact per-cell pairwise recomputation
    (same drop set AND same representative ids), and every dropped
    row's representative must have a smaller id. Vectors whose cosine
    to some partner lies within 1e-6 of tau are EXCLUDED from the
    agreement count: a pair that close to the threshold can land on
    either side depending on float64-BLAS vs decimal arithmetic, so
    without the band the gate would be data-dependently flaky rather
    than wrong (it never fires on the graded corpora, but the band
    makes the contract honest). Planted-duplicate recall is pinned in
    tests/test_semdedup.py."""
    from tms_etl_spark.operators.ivf import sample_centroids
    from tms_etl_spark.operators.semdedup import semdedup_flags

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sample_centroids(emb, _N_CELLS)
    flags = semdedup_flags(emb, cents, _TAU)

    # Decimal-exact twin on the SAME cell partition: per-cell pairs
    # via posexplode + (cell, dim-position) join, decimal dot/norms.
    withcell = emb.join(
        flags.select("vec_id", "cell"), "vec_id"
    ).select("vec_id", "cell", F.posexplode("embedding").alias("i", "x"))
    a = withcell.select(
        F.col("vec_id").alias("vec_a"), "cell", "i", F.col("x").alias("xa")
    )
    b = withcell.select(
        F.col("vec_id").alias("vec_b"), "cell", "i", F.col("x").alias("xb")
    )
    dd = decimal_dot
    pairs = (
        a.join(b, ["cell", "i"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.round(F.sum(dd(F.col("xa"), F.col("xb"))), 8)
            .cast("double")
            .alias("dot"),
            F.round(F.sum(dd(F.col("xa"), F.col("xa"))), 8)
            .cast("double")
            .alias("na"),
            F.round(F.sum(dd(F.col("xb"), F.col("xb"))), 8)
            .cast("double")
            .alias("nb"),
        )
    )
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))
    exact = (
        pairs.where(cos >= _TAU)
        .groupBy(F.col("vec_b").alias("vec_id"))
        .agg(F.min("vec_a").alias("dup_of_exact"))
    )
    # tolerance band: a vec with any partner cosine within eps of tau
    # can legitimately flip between the float-BLAS and decimal paths —
    # exclude it from the agreement count (gate-flake guard, ADVICE r4)
    near = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.max(
            F.when(F.abs(cos - F.lit(_TAU)) <= 1e-6, 1).otherwise(0)
        ).alias("__near")
    )
    cmp = (
        flags.join(exact, "vec_id", "full_outer")
        .join(near, "vec_id", "left")
    )
    clear = F.coalesce(F.col("__near"), F.lit(0)) == 0
    mismatch = F.count(
        F.when(
            clear
            & (
                (F.col("dropped") != F.col("dup_of_exact").isNotNull())
                | (
                    F.col("dropped")
                    & (F.col("dup_of") != F.col("dup_of_exact"))
                )
            ),
            1,
        )
    )
    bad_rep = F.count(
        F.when(F.col("dropped") & ~(F.col("dup_of") < F.col("vec_id")), 1)
    )
    summary = cmp.agg(
        F.count("*").cast("long").alias("n_corpus"),
        F.lit(_N_CELLS).alias("n_cells"),
        (bad_rep == 0).alias("dup_of_below_id_ok"),
        (mismatch == 0).alias("drops_match_exact"),
    )
    return summary
