"""Connected-components / dedup-cluster tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.operators.graph import connected_components, dedup_clusters


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping makes rounds O(log diameter): a depth-40 chain
    must converge within 8 rounds (reachable distance ~2^r per
    round), where plain neighbor-min propagation would need 40."""
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    cc = connected_components(edges, max_iter=8)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {0}
    assert cc.count() == n + 1


def test_connected_components_nonconvergence_raises(spark):
    """A chain deeper than the iteration budget must fail loudly, not
    return silently-split components (round-1 ADVICE item 5)."""
    import warnings

    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = connected_components(edges, max_iter=2, strict=False)
        assert any("did not converge" in str(x.message) for x in w)
    assert labels.count() == 13  # best-effort labels still returned


def test_dedup_clusters_from_minhash_pairs(spark, sf_dir):
    """End-to-end: planted near-dups → MinHash LSH pairs → clusters;
    every planted duplicate must resolve to its original as keeper."""
    from tms_etl_spark.operators.dedup import minhash_lsh_pairs
    from tms_etl_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    dup = d.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    pairs = minhash_lsh_pairs(d.unionByName(dup)).where(
        F.col("est_jaccard") > 0.5
    )
    clusters = {
        r["doc_id"]: (r["keeper_doc_id"], r["is_duplicate"])
        for r in dedup_clusters(pairs).collect()
    }
    hits = sum(
        1
        for i in range(50)
        if clusters.get(i + 10000, (None, None))[0] == i
        and clusters[i + 10000][1] is True
    )
    assert hits >= 45  # LSH recall tolerance
