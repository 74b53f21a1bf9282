"""Differential-oracle harness mirroring the driver's check:
run the Spark query and the DuckDB oracle on the same parquet tables,
canonicalize (columns sorted by name, rows sorted), compare values
exactly — matching the driver's order-insensitive value-hash."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from tms_etl_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return list(pdf.columns), rows


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        af, bf = float(a), float(b)
        if math.isnan(af) or math.isnan(bf):
            return math.isnan(af) and math.isnan(bf)
        return af == bf
    if isinstance(a, pd.Timestamp) or isinstance(b, pd.Timestamp):
        pa, pb = pd.Timestamp(a), pd.Timestamp(b)
        if pd.isna(pa) or pd.isna(pb):
            return pd.isna(pa) and pd.isna(pb)
        return pa == pb
    if pd.isna(a) or pd.isna(b):
        return bool(pd.isna(a)) and bool(pd.isna(b))
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in enumerate(zip(sr, orr)):
            assert _cell_eq(sv, ov), (
                f"{name}: row {i} col {s_cols[c]}: spark={sv!r} oracle={ov!r}"
            )
