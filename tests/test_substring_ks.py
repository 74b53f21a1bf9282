"""Semantics tests for the round-10 additions: exact repeated-
substring span detection (`repeated_span_pairs`) and the two-sample
Kolmogorov-Smirnov drift gate (`drift_ks`'s bucketed-ECDF shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.operators.dedup import repeated_span_pairs


def _doc(words):
    return " ".join(words)


def test_planted_span_exact_length(spark):
    """Two docs sharing an exact 20-token run report precisely
    max_span_tokens=20, and an 8-token overlap stays below the
    min_span=12 bar."""
    shared = [f"s{i}" for i in range(20)]
    short = [f"u{i}" for i in range(8)]
    rows = [
        (1, _doc([f"a{i}" for i in range(10)] + shared + ["aa", "ab"])),
        (2, _doc(["b0"] + shared + [f"b{i}" for i in range(7)])),
        (3, _doc([f"c{i}" for i in range(5)] + short + ["cc"])),
        (4, _doc(short + [f"d{i}" for i in range(9)])),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in repeated_span_pairs(df, k=5, min_span=12).collect()
    }
    assert set(out) == {(1, 2)}
    assert out[(1, 2)]["max_span_tokens"] == 20
    assert out[(1, 2)]["n_spans"] == 1


def test_two_separate_spans_counted(spark):
    """Two disjoint shared runs on different diagonals are reported
    as separate spans, not merged."""
    run1 = [f"x{i}" for i in range(12)]
    run2 = [f"y{i}" for i in range(15)]
    rows = [
        (1, _doc(run1 + [f"a{i}" for i in range(6)] + run2)),
        (2, _doc([f"b{i}" for i in range(4)] + run2 + ["mid"] + run1)),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repeated_span_pairs(df, k=5, min_span=12).collect()
    assert len(out) == 1
    assert out[0]["max_span_tokens"] == 15
    assert out[0]["n_spans"] == 2


def test_df_cut_drops_boilerplate_grams(spark):
    """A run present in MORE than max_df docs generates no anchors at
    all (boilerplate suppression) — so no pair is reported."""
    boiler = [f"bp{i}" for i in range(14)]
    rows = [
        (i, _doc([f"u{i}x{j}" for j in range(3)] + boiler))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = repeated_span_pairs(df, k=5, min_span=12, max_df=3).collect()
    assert out == []


def test_identical_docs_full_span(spark):
    """Exact duplicates report a span equal to the full token count."""
    words = [f"w{i}" for i in range(30)]
    df = spark.createDataFrame(
        [(1, _doc(words)), (2, _doc(words))], "doc_id int, text string"
    )
    out = repeated_span_pairs(df, k=5, min_span=12).collect()
    assert len(out) == 1
    assert out[0]["max_span_tokens"] == 30


def _ks_reference(xs, ys):
    """Pure-python two-sample KS statistic over pooled jump points."""
    points = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    d = 0.0
    for p in points:
        fa = sum(1 for x in xs if x <= p) / na
        fb = sum(1 for y in ys if y <= p) / nb
        d = max(d, abs(fa - fb))
    return d


def test_ks_statistic_matches_reference(spark):
    """The bucketed-ECDF KS pipeline (per-value counts, bucket
    offsets, local cumulative windows) reproduces the brute-force
    statistic on a shifted sample, and reports 0 for identical
    samples."""
    from pyspark.sql.window import Window

    xs = [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55]]
    ys = [x + 4.0 for x in xs]

    def ks_spark(xs, ys):
        rows = [(v, True) for v in xs] + [(v, False) for v in ys]
        pts = spark.createDataFrame(rows, "v double, in_a boolean")
        hist = pts.groupBy(
            F.floor(F.col("v") / 16).alias("bkt"), "v"
        ).agg(
            F.count(F.when(F.col("in_a"), 1)).alias("ca"),
            F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
        )
        btot = hist.groupBy("bkt").agg(
            F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
        )
        w_off = Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = btot.select(
            "bkt",
            F.coalesce(F.sum("ba").over(w_off), F.lit(0)).alias("oa"),
            F.coalesce(F.sum("bb").over(w_off), F.lit(0)).alias("ob"),
        )
        w_loc = (
            Window.partitionBy("bkt")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ecdf = hist.join(F.broadcast(offs), "bkt").select(
            (F.col("oa") + F.sum("ca").over(w_loc)).alias("cuma"),
            (F.col("ob") + F.sum("cb").over(w_loc)).alias("cumb"),
        )
        row = ecdf.agg(
            F.max(
                F.abs(
                    F.col("cuma").cast("double") / len(xs)
                    - F.col("cumb").cast("double") / len(ys)
                )
            ).alias("d")
        ).head()
        return row["d"]

    assert abs(ks_spark(xs, ys) - _ks_reference(xs, ys)) < 1e-12
    assert ks_spark(xs, xs) == 0.0


def test_drift_ks_catalog_entry_shape(spark, sf_dir):
    """The catalog entry returns one row with a valid statistic in
    [0, 1] and consistent sample sizes at the test SF."""
    from tms_etl_spark.catalog.behavior import drift_ks

    row = drift_ks(spark, sf_dir).head()
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["critical_005"] > 0.0
    assert row["drift_detected"] == (
        row["ks_stat"] > row["critical_005"]
    )


def test_bpe_encode_entry_invariants(spark, sf_dir):
    """text_bpe_encode's in-query invariants hold at the test SF."""
    from tms_etl_spark.catalog.llm_text import text_bpe_encode

    row = text_bpe_encode(spark, sf_dir).head()
    assert row["n_docs"] > 0
    assert row["tokens_within_bounds"] is True
    assert row["merges_reduce"] is True
    assert row["total_words"] <= row["total_word_chars"]
