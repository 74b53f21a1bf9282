"""SemDeDup operator tests: planted semantic duplicates must be
dropped with the lowest-id representative kept; orthogonal vectors
must survive; the keep-set must partition with the drop-set."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark import catalog
from tms_etl_spark.operators.ivf import sample_centroids
from tms_etl_spark.operators.semdedup import semdedup_flags, semdedup_keep

catalog.load_all()


def _planted(spark):
    """60 base vectors on distinct axes + near-copies of vec 0 and
    vec 7 (ids 100, 101, 107): cos(copy, base) ~ 0.999."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    base = {}
    for i in range(60):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        base[i] = v
        rows.append((i, [float(x) for x in v], 0))
    for new_id, src in ((100, 0), (101, 0), (107, 7)):
        v = base[src] + rng.normal(scale=0.01, size=16)
        rows.append((new_id, [float(x) for x in v], 0))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_planted_duplicates_dropped(spark):
    df = _planted(spark)
    cents = sample_centroids(df, 4)
    flags = {
        r["vec_id"]: r
        for r in semdedup_flags(df, cents, tau=0.95).collect()
    }
    assert len(flags) == 63
    # copies of vec 0 and 7 dropped, pointing at their source (the
    # lowest-id member of their duplicate group)
    for copy_id, src in ((100, 0), (101, 0), (107, 7)):
        assert flags[copy_id]["dropped"], copy_id
        assert flags[copy_id]["dup_of"] == src
    assert not flags[0]["dropped"]
    assert not flags[7]["dropped"]


def test_keep_partitions_corpus(spark):
    df = _planted(spark)
    cents = sample_centroids(df, 4)
    kept = semdedup_keep(df, cents, tau=0.95)
    flags = semdedup_flags(df, cents, tau=0.95)
    n_drop = flags.where("dropped").count()
    assert kept.count() + n_drop == df.count()
    # random unit vectors in 16-d essentially never reach cos 0.95
    assert n_drop == 3


def test_catalog_entry_agrees(spark, sf_dir):
    row = catalog.QUERIES["dedup_semantic"](spark, sf_dir).collect()[0]
    assert row["drops_match_exact"] is True
    assert row["dup_of_below_id_ok"] is True
    assert row["n_corpus"] > 0
