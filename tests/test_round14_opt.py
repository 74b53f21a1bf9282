"""Round-14 optimization pins.

1. Footer STRING bounds exactness guard: bounds at/over the trust
   boundary (possible truncation products of a foreign writer) force
   the full-aggregation fallback; bounds under it stay on the fast
   path with exact parity.

2. `pagerank(pins_out=...)` exposes its checkpoint pins so a caller
   that fully consumes the ranks can release them — zero
   block-manager residue — and the deg-fused edge list computes the
   same ranks (rank/deg over identical values) as the r13 shape.

3. `triangle_count` zero-residue eager census is pinned in
   test_round13_opt (updated there).

4. `search_token` completeness without the conservative-rescan set:
   a live file whose column yields NO tokens (the one shape absent
   from the sidecar) must neither break the search nor leak wrong
   rows; non-tokenizable probes ("" and punctuation) fall back to the
   exact residual scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

import tms_etl_spark.operators.versioned as vt
from tms_etl_spark.operators.checkpoints import unpersist_checkpoint


def _agg_stats(monkeypatch, spark, tdir, rel, schema):
    monkeypatch.setattr(vt, "_footer_file_stats", lambda *a, **k: None)
    try:
        return vt._dir_file_stats(spark, tdir, rel, schema=schema)
    finally:
        monkeypatch.undo()


REL = "data/v000001-pin14"


def test_footer_string_bounds_trust_boundary(spark, tmp_path, monkeypatch):
    """A string bound >= _STR_STAT_TRUST_BYTES forces the fallback
    (could be a foreign writer's truncation product); one byte under
    stays on the fast path with aggregation parity."""
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    cap = vt._STR_STAT_TRUST_BYTES

    long_t = str(tmp_path / "long")
    df = spark.createDataFrame([(1, "a" * cap), (2, "b")], schema).coalesce(1)
    df.write.parquet(f"{long_t}/{REL}")
    assert vt._footer_file_stats(long_t, REL, schema) is None
    # the fallback aggregation still records the exact long bounds
    agg = _agg_stats(monkeypatch, spark, long_t, REL, schema)
    (entry,) = agg.values()
    assert entry["s"] == ["a" * cap, "b"]

    short_t = str(tmp_path / "short")
    df = spark.createDataFrame(
        [(1, "a" * (cap - 1)), (2, "b")], schema
    ).coalesce(1)
    df.write.parquet(f"{short_t}/{REL}")
    fast = vt._footer_file_stats(short_t, REL, schema)
    assert fast is not None, "sub-boundary strings must stay on the fast path"
    assert fast == _agg_stats(monkeypatch, spark, short_t, REL, schema)


def test_footer_string_guard_counts_bytes_not_chars(
    spark, tmp_path, monkeypatch
):
    """The boundary is UTF-8 BYTES (what a truncating writer cuts),
    not Python characters."""
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )
    cap = vt._STR_STAT_TRUST_BYTES
    # 3-byte code points: char length cap//3 < cap, byte length >= cap
    val = "€" * (cap // 3 + 1)
    tdir = str(tmp_path / "t")
    spark.createDataFrame([(1, val)], schema).coalesce(1).write.parquet(
        f"{tdir}/{REL}"
    )
    assert vt._footer_file_stats(tdir, REL, schema) is None


def test_pagerank_pins_out_zero_residue(spark):
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "u long, v long"
    )
    sc = spark.sparkContext
    before_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    pins: list = []
    pr = pagerank(edges, pins_out=pins)
    rows = {r["node"]: r["rank"] for r in pr.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # total rank mass stays ~1 (damping redistribution is mass-
    # preserving up to sink-free-graph semantics)
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert len(pins) == 2  # deg + deg-fused edge list
    for p in pins:
        assert unpersist_checkpoint(p) is True
    # id-based residue check: concurrent ContextCleaner activity on
    # OTHER tests' stale pins makes a count delta racy
    after_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after_ids - before_ids == set()


def test_pagerank_catalog_entry_leaves_no_pins(spark, sf_dir):
    from tms_etl_spark import catalog

    catalog.load_all()
    sc = spark.sparkContext
    before_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = catalog.QUERIES["graph_pagerank_topk"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    # ranks are sorted desc with node tiebreak, and the entry
    # materialized its top-k: no checkpoint residue
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    after_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after_ids - before_ids == set()


def test_search_token_zero_token_file_and_degenerate_probes(
    spark, tmp_path
):
    """One committed file holds only non-tokenizable text (no posting
    rows anywhere for it): the index-routed search must still return
    exactly the residual-filter answer; '' and punctuation probes
    (which the tokenizer can never emit as postings, but which
    array_contains CAN match at split boundaries) take the exact
    fallback scan."""
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.textindex import (
        build_text_index,
        search_token,
        tokens_of,
    )
    from tms_etl_spark.operators.versioned import read_version, write_version

    tdir = str(tmp_path / "t")
    with_tokens = spark.createDataFrame(
        [(1, "the dup row"), (2, "clean text")], "doc_id long, text string"
    ).coalesce(1)
    only_punct = spark.createDataFrame(
        [(3, "!!! ---"), (4, "...")], "doc_id long, text string"
    ).coalesce(1)
    write_version(with_tokens, tdir, "append")
    write_version(only_punct, tdir, "append")
    build_text_index(spark, tdir, "text")

    got = {r["doc_id"] for r in search_token(spark, tdir, "text", "dup").collect()}
    assert got == {1}
    # miss: no file scanned, empty result — schema intact
    assert search_token(spark, tdir, "text", "absent").count() == 0

    # degenerate probes: must equal the plain residual filter over
    # the full table (the "" probe DOES match boundary artifacts)
    base = read_version(spark, tdir)
    for probe in ("", "dup!"):
        want = {
            r["doc_id"]
            for r in base.where(
                F.array_contains(tokens_of("text"), probe)
            ).collect()
        }
        got = {
            r["doc_id"]
            for r in search_token(spark, tdir, "text", probe).collect()
        }
        assert got == want, probe


def test_build_text_index_releases_its_checkpoint(spark, tmp_path):
    from tms_etl_spark.operators.textindex import build_text_index
    from tms_etl_spark.operators.versioned import write_version

    tdir = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(i, f"token{i} shared") for i in range(20)],
        "doc_id long, text string",
    )
    write_version(d.repartition(2), tdir, "append")
    sc = spark.sparkContext
    before_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    build_text_index(spark, tdir, "text")
    after_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after_ids - before_ids == set()
