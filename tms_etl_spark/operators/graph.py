"""Connected components over a pair list (iterative label
propagation) — the step that turns near-duplicate PAIRS (from
MinHash/LSH or Jaccard) into duplicate CLUSTERS with one keeper per
cluster.

Algorithm: every node starts labeled with itself; each round, every
node adopts the minimum label in its neighborhood (including its
own); stop when no label changes. Converges in O(diameter) rounds —
near-dup graphs are unions of small cliques, so typically 2-3 rounds.

Scale shape per round: one join edges⋈labels (shuffle on node id) +
one min-aggregation. The driver only orchestrates the loop and reads
a single convergence count — no data ever collects to the driver.
``localCheckpoint`` truncates the lineage each round, or iteration i
re-executes all previous rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, component) where component = min node id in the
    component. Nodes appearing only in edges are covered; isolated
    nodes aren't known to the edge list and should be unioned in by
    the caller if needed.

    Min-label propagation needs O(diameter) rounds. If labels are
    still changing when ``max_iter`` runs out (a chain-shaped graph
    deeper than the budget), the labels are WRONG — components come
    out split, i.e. duplicate docs silently survive dedup. ``strict``
    (default) raises in that case; ``strict=False`` logs a warning
    and returns the unconverged labels for callers that prefer
    best-effort (round-1 ADVICE item 5: never silent).
    """
    # Materialize the symmetrized edge list ONCE: it is joined every
    # round, and without truncation each round would re-execute the
    # whole upstream candidate pipeline (MinHash/LSH) that produced
    # the pairs — measured as the dominant cost of dedup_clusters.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("component").alias("__old"),
            F.least(
                F.col("component"),
                F.coalesce("nbr_component", F.col("component")),
            ).alias("component"),
        )
        # Pointer jumping (shortcutting): component <- label(component).
        # Plain neighbor-min needs O(diameter) rounds — a depth-1000
        # chain would mean 1000 shuffle rounds; composing each node's
        # label with its LABEL'S label doubles the reachable distance
        # per round, so convergence is O(log diameter) at the price of
        # one extra equi-join per round.
        parents = propagated.select(
            F.col("node").alias("component"),
            F.col("component").alias("__parent"),
        )
        updated = (
            propagated.join(parents, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("__parent", F.col("component")),
                ).alias("component"),
                (
                    F.least(
                        F.col("component"),
                        F.coalesce("__parent", F.col("component")),
                    )
                    < F.col("__old")
                ).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    else:  # loop exhausted with changed > 0
        msg = (
            f"connected_components did not converge in {max_iter} rounds; "
            "labels are split (graph diameter exceeds the iteration "
            "budget) — raise max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_clusters(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Duplicate clusters from near-dup pairs: (node, keeper) where
    keeper = the cluster's minimum doc id (the survivor; everything
    else is a duplicate to drop)."""
    cc = connected_components(pairs, src, dst)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("keeper_doc_id"),
        (F.col("node") != F.col("component")).alias("is_duplicate"),
    )
