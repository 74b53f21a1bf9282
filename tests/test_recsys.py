"""Semantic pins for the recommendation / link-prediction family.
Cross-engine values are covered by the oracle sweep; these pin the
algorithms on planted graphs where the answer is hand-computable.
"""

from __future__ import annotations

import math

from tms_etl_spark.operators.graph import link_prediction_topk


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_link_prediction_triangle_completion(spark):
    """Path a-b-c plus a-d: (a,c) share neighbor b; (b,d) share a."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 4)])
    got = {
        (r["u"], r["w"]): (r["cn"], r["ra"])
        for r in link_prediction_topk(e, k=10).collect()
    }
    # deg: 1->2, 2->2, 3->1, 4->1
    assert got[(1, 3)] == (1, 0.5)   # via z=2 (deg 2)
    assert got[(2, 4)] == (1, 0.5)   # via z=1 (deg 2)
    assert (3, 4) not in got         # no shared neighbor
    assert len(got) == 2


def test_link_prediction_excludes_existing_edges_and_ranks_cn_first(spark):
    """K4 minus one edge: the missing edge has 2 common neighbors and
    must rank first; existing edges never appear."""
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    rows = link_prediction_topk(e, k=10).collect()
    assert rows[0]["u"] == 3 and rows[0]["w"] == 4
    assert rows[0]["cn"] == 2
    # RA: z in {1, 2}, both deg 3 -> 2 * round(1/3, 8)
    assert math.isclose(rows[0]["ra"], round(2 / 3, 6), abs_tol=2e-6)
    existing = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)}
    assert all((r["u"], r["w"]) not in existing for r in rows)


def test_link_prediction_hub_cap_drops_star_center(spark):
    """A star with a high-degree hub: with max_hub_deg below the hub
    degree no wedges survive (the hub is the only shared neighbor)."""
    hub_edges = [(0, i) for i in range(1, 12)]
    e = _edges(spark, hub_edges)
    got = link_prediction_topk(e, k=100, max_hub_deg=10).collect()
    assert got == []
    # raising the cap re-admits the hub's wedges: C(11, 2) pairs
    got2 = link_prediction_topk(e, k=100, max_hub_deg=11).collect()
    assert len(got2) == 55
    assert all(r["cn"] == 1 for r in got2)


def test_item_cf_cosine_bounds_and_perfect_pair(spark, sf_dir):
    from tms_etl_spark.catalog import load_all, QUERIES

    load_all()
    rows = QUERIES["recs_item_cf_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0.0 < r["cosine"] <= 1.0 + 1e-12
        assert r["cooc"] >= 2
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)
