"""Differential oracle tests: every catalog query with a declared
oracle must match DuckDB exactly (value-level) — the same comparison
the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from tms_etl_spark import catalog
from tests.oracle_utils import assert_frames_match, duck_connection

catalog.load_all()

ORACLE_NAMES = sorted(catalog.ORACLES)
ROWS_ONLY_NAMES = sorted(set(catalog.QUERIES) - set(catalog.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    df = catalog.QUERIES[name](spark, sf_dir)
    spark_pdf = df.toPandas()
    con = duck_connection(sf_dir)
    oracle_pdf = con.sql(catalog.ORACLES[name]).df()
    con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_oracle_gate_is_dtype_strict():
    """Regression pin for the r9–r10 invisible failure class: DuckDB's
    bare SUM(BIGINT) returns HUGEINT → pandas float64 while Spark sums
    to int64; loose numeric equality (223738.0 == 223738) hid the
    ``lakehouse_type_widening`` driver hash-fail from every local gate
    for two rounds. The gate must now fail the exact pre-fix shape."""
    import numpy as np
    import pandas as pd

    from tests.oracle_utils import _cell_eq, assert_frames_match

    # kind mismatch fails even when numerically equal
    assert not _cell_eq(np.float64(223738.0), np.int64(223738))
    # width differences still collapse (the driver canonicalises them)
    assert _cell_eq(np.int32(5), np.int64(5))
    assert _cell_eq(np.float32(2.5), np.float64(2.5))
    sp = pd.DataFrame({"key_sum": pd.Series([223738], dtype="int64")})
    du = pd.DataFrame({"key_sum": pd.Series([223738.0], dtype="float64")})
    with pytest.raises(AssertionError, match="key_sum"):
        assert_frames_match(sp, du, "pre_fix_type_widening")
    # and the empty-result case is caught by the column-kind check
    with pytest.raises(AssertionError, match="dtype kind"):
        assert_frames_match(sp.iloc[:0], du.iloc[:0], "empty_kind_drift")


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    df = catalog.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_skyline_matches_bruteforce_random(spark):
    """Property: the bucketed sweep equals the quadratic definition
    on random points with duplicates and ties."""
    import itertools
    import random

    from tms_etl_spark.operators.windows import skyline_2d

    rng = random.Random(5)
    pts = [
        (i, float(rng.randrange(0, 50)), rng.randrange(0, 30))
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    got = {r["id"] for r in skyline_2d(df, "x", "y", band_width=7.0).collect()}
    expect = {
        i
        for i, x, y in pts
        if not any(
            (qx <= x and qy >= y and (qx < x or qy > y))
            for _, qx, qy in pts
        )
    }
    assert got == expect


def test_interval_islands_matches_python_merge(spark):
    """Property: window-based island merging equals a plain python
    interval-union on random interval sets (overlaps, touches,
    nesting, duplicates)."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(13)
    rows = []
    for key in range(20):
        for _ in range(rng.randrange(1, 15)):
            s = rng.randrange(0, 60)
            rows.append((key, s, s + rng.randrange(1, 10)))

    def py_merge(iv):
        iv = sorted(iv)
        out = []
        for s, e in iv:
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        return out

    expect = {}
    for k in {r[0] for r in rows}:
        merged = py_merge([(s, e) for kk, s, e in rows if kk == k])
        expect[k] = (len(merged), sum(e - s for s, e in merged))

    df = spark.createDataFrame(rows, ["k", "s", "e"])
    w = Window.partitionBy("k").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "ni",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "iid", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = islands.groupBy("k", "iid").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    got = {
        r["k"]: (r["n"], r["cov"])
        for r in merged.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("me") - F.col("ms")).alias("cov"),
        )
        .collect()
    }
    assert got == expect
