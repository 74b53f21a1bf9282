"""Simulate the driver's correctness gate: plain SparkSession (no
engine session helper), every catalog query vs its DuckDB oracle at
sf0.01 (or $SIM_SF_DIR), exact value comparison.

Usage: python scripts/driver_sim.py [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from tms_etl_spark import catalog
from tms_etl_spark.sources.tables import TABLE_NAMES


# ONE implementation of the dtype-STRICT comparison, shared with the
# pytest gate — two drifting copies would recreate exactly the
# "local green, driver red" class this strictness exists to kill.
from tests.oracle_utils import _cell_eq as cell_eq  # noqa: E402


def canon(pdf: pd.DataFrame):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return list(pdf.columns), rows


def main() -> int:
    sf_dir = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
    catalog.load_all()
    names = sys.argv[1:] or sorted(catalog.ORACLES)
    # SIM_MASTER / SIM_SHUFFLE let the gate re-run under a different
    # parallelism (e.g. local[2] + 3 shuffle partitions) — results
    # must be partition-layout-independent or the driver's unknown
    # session config could flip them.
    spark = (
        SparkSession.builder.master(os.environ.get("SIM_MASTER", "local[8]"))
        .config(
            "spark.sql.shuffle.partitions", os.environ.get("SIM_SHUFFLE", "200")
        )
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        try:
            sp_cols, sp_rows = canon(catalog.QUERIES[name](spark, sf_dir).toPandas())
            du_cols, du_rows = canon(con.sql(catalog.ORACLES[name]).df())
            if sp_cols != du_cols:
                failures.append((name, f"cols {sp_cols} vs {du_cols}"))
                continue
            if len(sp_rows) != len(du_rows):
                failures.append((name, f"rows {len(sp_rows)} vs {len(du_rows)}"))
                continue
            bad = None
            for i, (r1, r2) in enumerate(zip(sp_rows, du_rows)):
                for c, (a, b) in enumerate(zip(r1, r2)):
                    if not cell_eq(a, b):
                        bad = f"row {i} col {sp_cols[c]}: {a!r} vs {b!r}"
                        break
                if bad:
                    break
            if bad:
                failures.append((name, bad))
            else:
                print(f"  OK {name} ({len(sp_rows)} rows)")
        except Exception as exc:  # surface per-query errors, keep going
            failures.append((name, f"EXC {type(exc).__name__}: {exc}"))

    print(f"\n{len(names) - len(failures)}/{len(names)} matched at {sf_dir}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
