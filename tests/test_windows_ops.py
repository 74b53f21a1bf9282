"""Behavioral pins for the bounded-buffer window replacements in
`tms_etl_spark.operators.windows`."""

from __future__ import annotations

from tms_etl_spark.operators.windows import grouped_topk_agg


def test_grouped_topk_agg_ignores_null_order_values(spark):
    """ADVICE r5 (low): the descending path (array_sort + reverse)
    used to promote NULL order values to the TOP of the ranking,
    diverging from the window form (row_number ORDER BY x DESC =
    NULLs last). NULL order rows are now excluded up front: top-k by
    a NULL rank is meaningless, and a group with fewer than k
    non-null rows returns just those rows."""
    df = spark.createDataFrame(
        [
            ("g1", None, "n1"),
            ("g1", 3.0, "a"),
            ("g1", 1.0, "b"),
            ("g1", None, "n2"),
            ("g2", None, "n3"),  # group with ZERO non-null orders
            ("g3", 5.0, "c"),  # fewer than k non-null rows
        ],
        "g string, x double, p string",
    )
    out = grouped_topk_agg(df, ["g"], "x", k=2).collect()
    got = [(r["g"], r["x"], r["p"]) for r in out]
    assert got == [("g1", 3.0, "a"), ("g1", 1.0, "b"), ("g3", 5.0, "c")]

    # ascending path: same exclusion
    asc = grouped_topk_agg(df, ["g"], "x", k=1, ascending=True).collect()
    assert [(r["g"], r["x"]) for r in asc] == [("g1", 1.0), ("g3", 5.0)]
