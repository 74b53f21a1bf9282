"""Bucketized range join correctness + hypothesis property tests for
the merge operator (SURVEY.md §5.4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tms_etl_spark.operators.merge import dedupe_batch, upsert, upsert_guarded
from tms_etl_spark.operators.rangejoin import bucketized_range_join
from tms_etl_spark.sources.tables import load_table


def test_bucketized_range_join_equals_naive(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.unix_timestamp("ts").alias("t"))
        .limit(300)
    )
    # synthetic intervals spanning the event range
    iv = spark.createDataFrame(
        [(i, 1704067200 + i * 3600, 1704067200 + i * 3600 + 7200) for i in range(50)],
        "iv_id long, lo long, hi long",
    )
    naive = (
        ev.crossJoin(iv)
        .where((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
        .select("event_id", "iv_id")
    )
    bucketed = bucketized_range_join(
        ev, iv, point_col="t", lo_col="lo", hi_col="hi", bucket_width=3600
    ).select("event_id", "iv_id")
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, bucketed.collect())
    )


# ---------------------------------------------------------- properties
rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # key
        st.integers(min_value=0, max_value=1000),  # value
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, pairs, dedupe=True):
    df = spark.createDataFrame(
        [(k, v) for k, v in pairs] or [(None, None)], "k int, v int"
    ).where(F.col("k").isNotNull())
    if dedupe:
        df = dedupe_batch(df, keys=["k"], precedence=[F.col("v")])  # larger v wins
    return df


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=rows, batch=rows)
def test_upsert_source_wins_and_preserves_rest(spark, target, batch):
    t = _df(spark, target)
    b = _df(spark, batch)
    merged = {r["k"]: r["v"] for r in upsert(t, b, keys=["k"]).collect()}
    tt = {r["k"]: r["v"] for r in t.collect()}
    bb = {r["k"]: r["v"] for r in b.collect()}
    expect = {**tt, **bb}  # batch overrides target
    assert merged == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=rows, batch=rows)
def test_upsert_idempotent(spark, target, batch):
    t = _df(spark, target)
    b = _df(spark, batch)
    once = upsert(t, b, keys=["k"])
    twice = upsert(once, b, keys=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=rows, batch=rows)
def test_guarded_upsert_never_overwrites_existing_with_guarded_rows(
    spark, target, batch
):
    t = _df(spark, target)
    b = _df(spark, batch)
    # guard: odd values are "suspect" (insert-only)
    merged = {
        r["k"]: r["v"]
        for r in upsert_guarded(
            t, b, keys=["k"], insert_only=(F.col("v") % 2 == 1)
        ).collect()
    }
    tt = {r["k"]: r["v"] for r in t.collect()}
    bb = {r["k"]: r["v"] for r in b.collect()}
    for k, v in merged.items():
        if k in tt and k in bb and bb[k] % 2 == 1:
            assert v == tt[k]  # guarded row could not overwrite
        elif k in bb and bb[k] % 2 == 0:
            assert v == bb[k]  # normal rows win
        elif k not in bb:
            assert v == tt[k]


def test_guarded_upsert_null_guard_is_insert_only(spark, tmp_path):
    """A NULL guard must take the conservative insert-only fate —
    target kept on match, row inserted when unmatched — NOT vanish
    from both branches (pre-fix: where(p) and where(~p) both exclude
    NULL, silently dropping the row from the merge). Also pins
    row-for-row parity with the versioned MERGE's expression of the
    same contract (WHEN MATCHED AND NOT <guard>, NULL→false)."""
    from tms_etl_spark.operators.versioned import (
        merge_version,
        read_version,
        write_version,
    )

    t = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 0)], "k int, v int, flag int"
    )
    # flag NULL → guard (flag == 1) is NULL for rows k=2 (matched)
    # and k=3 (unmatched); k=1 is a normal update
    b = spark.createDataFrame(
        [(1, 100, 0), (2, 200, None), (3, 300, None)],
        "k int, v int, flag int",
    )
    got = {
        r["k"]: r["v"]
        for r in upsert_guarded(
            t, b, keys=["k"], insert_only=(F.col("flag") == 1)
        ).collect()
    }
    assert got == {1: 100, 2: 20, 3: 300}

    tdir = str(tmp_path / "vt")
    write_version(t, tdir, "append")
    merge_version(
        spark,
        tdir,
        b,
        "k",
        when_matched_condition="NOT (source.flag = 1)",
    )
    vgot = {r["k"]: r["v"] for r in read_version(spark, tdir).collect()}
    assert vgot == got


def test_asof_forward_and_tolerance_semantics(spark):
    """Forward direction picks the EARLIEST right row at-or-after the
    left timestamp; tolerance nulls matches farther than the bound;
    equal timestamps match inclusively in both directions."""
    import datetime as dt

    from tms_etl_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    left = spark.createDataFrame(
        [("k", t(10), "L10"), ("k", t(30), "L30"), ("k", t(50), "L50")],
        "key string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("k", t(10), 100.0), ("k", t(35), 200.0), ("k", t(200), 300.0)],
        "key string, ts timestamp, v double",
    )

    fwd = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["key"], ts="ts", right_cols=["v"],
            direction="forward",
        ).collect()
    }
    # L10 matches the equal-ts right row (inclusive); L30 the next one
    assert fwd == {"L10": 100.0, "L30": 200.0, "L50": 300.0}

    tol = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["key"], ts="ts", right_cols=["v"],
            direction="forward", tolerance="30 minutes",
        ).collect()
    }
    # L50's nearest following row is 150 min away -> nulled by tolerance
    assert tol == {"L10": 100.0, "L30": 200.0, "L50": None}

    back = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["key"], ts="ts", right_cols=["v"],
            tolerance="15 minutes",
        ).collect()
    }
    # backward: L30's latest earlier row is t10 (20 min back -> nulled);
    # L50's is t35 (15 min back -> inclusive match)
    assert back == {"L10": 100.0, "L30": None, "L50": 200.0}

    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on=["key"], ts="ts", right_cols=["v"],
                  direction="sideways")


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Nearest-direction parity with pandas merge_asof on a crafted
    frame exercising: forward-closer, backward-closer, exact tie
    (→ backward), no-backward-exists, no-forward-exists, empty key."""
    import pandas as pd

    from tms_etl_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c"],
            "t": [10, 55, 100, 5, 7],
            "lid": [1, 2, 3, 4, 5],
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "t": [0, 60, 90, 5],
            "rv": [100, 600, 900, 500],
        }
    )
    expected = pd.merge_asof(
        left_pd.sort_values("t"),
        right_pd.sort_values("t"),
        on="t",
        by="k",
        direction="nearest",
    ).sort_values("lid")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = (
        asof_join(
            left,
            right,
            on=["k"],
            ts="t",
            right_cols=["rv"],
            suffix="",
            direction="nearest",
        )
        .orderBy("lid")
        .toPandas()
    )
    exp = [None if pd.isna(x) else int(x) for x in expected["rv"]]
    act = [None if pd.isna(x) else int(x) for x in got["rv"]]
    assert act == exp, (act, exp)
