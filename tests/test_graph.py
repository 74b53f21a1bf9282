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


def test_triangle_count_known_graph(spark):
    from tms_etl_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 (no new ones)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["u", "v"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["max_degree"] == 4


def test_triangle_count_star_has_none(spark):
    from tms_etl_spark.operators.graph import triangle_count

    # a hot hub: star graph — the degree orientation points every
    # edge AT the hub, so the hub has zero out-wedges and the count
    # is 0 without ever joining hub-degree² candidate pairs
    edges = [(0, i) for i in range(1, 30)]
    df = spark.createDataFrame(edges, ["u", "v"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0
    assert row["max_degree"] == 29


def test_pagerank_mass_and_hub(spark):
    from tms_etl_spark.operators.graph import pagerank

    # star: hub must dominate; total mass stays ~1
    edges = [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, ["u", "v"])
    rows = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert len(rows) == 11
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    hub = rows[0]
    for leaf in range(1, 11):
        assert hub > rows[leaf]
    # leaves are symmetric: identical ranks bit-for-bit
    assert len({rows[leaf] for leaf in range(1, 11)}) == 1


def test_triangle_count_random_vs_bruteforce(spark):
    """Differential: degree-oriented count vs itertools brute force
    on seeded Erdos-Renyi graphs."""
    import itertools
    import random

    from tms_etl_spark.operators.graph import triangle_count

    for seed in (7, 21):
        rng = random.Random(seed)
        n = 40
        edges = [
            (u, v)
            for u, v in itertools.combinations(range(n), 2)
            if rng.random() < 0.15
        ]
        adj = set(edges)
        expect = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        df = spark.createDataFrame(edges, ["u", "v"])
        row = triangle_count(df).collect()[0]
        assert row["n_triangles"] == expect, f"seed {seed}"
        assert row["n_edges"] == len(edges)


def test_pagerank_matches_power_iteration(spark):
    """Differential: the decimal-exact distributed recurrence vs a
    plain Python power iteration (same damping/iters) — agreement to
    1e-9 (the decimal rounding floor is 1e-14)."""
    import itertools
    import random

    from tms_etl_spark.operators.graph import pagerank

    rng = random.Random(3)
    n = 25
    edges = [
        (u, v)
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < 0.2
    ]
    nodes = sorted({x for e in edges for x in e})
    deg = {x: 0 for x in nodes}
    nbrs = {x: [] for x in nodes}
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
        nbrs[u].append(v)
        nbrs[v].append(u)
    r = {x: 1.0 / len(nodes) for x in nodes}
    for _ in range(5):
        r = {
            x: 0.15 / len(nodes)
            + 0.85 * sum(r[y] / deg[y] for y in nbrs[x])
            for x in nodes
        }
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {row["node"]: row["rank"] for row in pagerank(df).collect()}
    assert set(got) == set(nodes)
    for x in nodes:
        assert abs(got[x] - r[x]) < 1e-9, x


def test_bfs_levels_known_graph(spark):
    from tms_etl_spark.operators.graph import bfs_levels

    # path 1-2-3-4-5 plus chord 1-4; min node = 1 is the source
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["level"] for r in bfs_levels(df).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_levels_radius_bound(spark):
    from tms_etl_spark.operators.graph import bfs_levels

    # chain 0-1-...-9: radius 6 must label nodes 0..6 only
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["level"] for r in bfs_levels(df, max_depth=6).collect()}
    assert got == {i: i for i in range(7)}
