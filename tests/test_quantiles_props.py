"""Property tests for the shared bucketed-quantile engine
(`operators/quantiles.py`): the distributed bucketed computation must
equal a brute-force single-list reference for any data and any q —
including skewed, constant, negative and huge-range inputs the range
bucketing has to survive."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tms_etl_spark.operators.quantiles import (
    histogram_quantile_thresholds,
    score_against_thresholds,
)


def _brute_thresholds(values: list[int], q: int) -> list[int]:
    s = sorted(values)
    n = len(s)
    out = []
    for k in range(1, q):
        # smallest v with q*count(<=v) >= k*n == element at index
        # ceil(k*n/q) - 1 of the sorted multiset
        idx = -(-k * n // q) - 1
        out.append(s[idx])
    return out


vals = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=80
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=vals, q=st.sampled_from([2, 4, 5, 10]))
def test_thresholds_match_bruteforce(spark, values, q):
    df = spark.createDataFrame([(v,) for v in values], "v long").repartition(4)
    row = histogram_quantile_thresholds(df, "v", q, prefix="t").head()
    got = [row[f"t{k}"] for k in range(1, q)]
    assert got == _brute_thresholds(values, q)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=vals)
def test_quintile_scores_are_balanced_and_monotone(spark, values):
    """Scores 1..5 must be monotone in the value and each score class
    ≤ ceil(n/5) + (duplicates at a threshold) — the defining property
    of equal-frequency bins with integer thresholds."""
    df = spark.createDataFrame([(v,) for v in values], "v long")
    th = histogram_quantile_thresholds(df, "v", 5, prefix="t")
    scored = (
        df.crossJoin(F.broadcast(th))
        .select("v", score_against_thresholds("v", "t", 5).alias("s"))
        .collect()
    )
    by_v = sorted([(r["v"], r["s"]) for r in scored])
    assert all(1 <= s <= 5 for _, s in by_v)
    assert all(
        s1 <= s2 for (_, s1), (_, s2) in zip(by_v, by_v[1:])
    )  # monotone in v
    # equal values always share a score
    seen = {}
    for v, s in by_v:
        assert seen.setdefault(v, s) == s


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=vals)
def test_histogram_median_matches_statistics_median(spark, values):
    import statistics

    from tms_etl_spark.operators.quantiles import histogram_median

    df = spark.createDataFrame([(v,) for v in values], "v long").repartition(3)
    got = histogram_median(df, "v").head()["median"]
    assert got == float(statistics.median(values))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-(2**40), max_value=2**40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_grouped_median_matches_statistics(spark, data):
    import statistics
    from collections import defaultdict

    from tms_etl_spark.operators.quantiles import histogram_median_per_group

    df = spark.createDataFrame(data, "g string, v long").repartition(3)
    got = {
        r["g"]: r["median"]
        for r in histogram_median_per_group(df, "g", "v").collect()
    }
    byg = defaultdict(list)
    for g, v in data:
        byg[g].append(v)
    assert got == {g: float(statistics.median(vs)) for g, vs in byg.items()}
