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
