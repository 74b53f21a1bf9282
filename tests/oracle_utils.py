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


def _canon_cell(x):
    """Collapse numpy scalars / pandas timestamps to plain Python so
    WIDTH (int32 vs int64, datetime ns vs us) doesn't matter — but
    KIND (int vs float vs Decimal) does."""
    if type(x).__module__ == "numpy":
        x = x.tolist() if getattr(x, "ndim", 0) else x.item()
    if isinstance(x, pd.Timestamp):
        x = x.to_pydatetime()
    return x


def _cell_eq(a, b) -> bool:
    """Dtype-STRICT cell comparison (r11, mirrors
    scripts/driver_sim.py): the driver's gate hashes canonical cell
    reprs, so ``223738.0 == 223738`` being numerically true is NOT
    enough — a float64 column vs an int64 column hashes differently
    and fails the real gate (this class hid the
    ``lakehouse_type_widening`` red for two rounds: DuckDB's bare
    ``SUM(BIGINT)`` returns HUGEINT → pandas float64 while Spark sums
    to int64). After scalar canonicalisation, mismatched Python types
    FAIL even when values compare equal."""
    a, b = _canon_cell(a), _canon_cell(b)
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if type(a) is not type(b) and not (
        isinstance(a, (list, tuple)) and isinstance(b, (list, tuple))
    ):
        return False
    if isinstance(a, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(
            _cell_eq(x, y) for x, y in zip(a, b)
        )
    try:
        return bool(a == b)
    except Exception:
        return repr(a) == repr(b)


# numpy dtype KIND → comparison class: width differences (int32 vs
# int64, datetime ns vs us) hash identically after canonicalisation,
# but int vs float vs object do not.
_KIND_LABEL = {
    "i": "int", "u": "int", "f": "float", "b": "bool",
    "M": "datetime", "m": "timedelta", "O": "object",
}


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    # column-level dtype-KIND agreement (r11): catches int64 vs
    # float64 drift even when every value compares numerically equal
    # (and on empty results, where there are no cells to compare) —
    # the class that kept lakehouse_type_widening red for two rounds
    for c in s_cols:
        sk = _KIND_LABEL.get(spark_pdf[c].dtype.kind, spark_pdf[c].dtype.kind)
        ok = _KIND_LABEL.get(oracle_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind)
        assert sk == ok, (
            f"{name}: column {c} dtype kind {sk} (spark "
            f"{spark_pdf[c].dtype}) vs {ok} (oracle "
            f"{oracle_pdf[c].dtype}) — the driver's canonical hash "
            "sees different cell reprs even when values are equal"
        )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    )
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in enumerate(zip(sr, orr)):
            assert _cell_eq(sv, ov), (
                f"{name}: row {i} col {s_cols[c]}: spark={sv!r} oracle={ov!r}"
            )
