"""CLI front door: `python -m tms_etl_spark <subcommand>`.

A reference user drives their ETL from a launcher, not a Python
REPL; this is the engine's equivalent — every catalog query, raw SQL
over the registered tables, and plan inspection from one command:

    python -m tms_etl_spark list [substring]
    python -m tms_etl_spark run <query> [--sf-dir DIR] [--limit N]
    python -m tms_etl_spark explain <query> [--sf-dir DIR]
    python -m tms_etl_spark sql "SELECT ... FROM lineitem ..." [--sf-dir DIR]

Output goes to stdout (`run` prints `show()`-style tables capped at
--limit rows; `sql` the same). Exit code 0 on success, 2 on unknown
query/subcommand. The SparkSession comes from the engine's tuned
builder (`session.get_spark`: AQE, UTC, broadcast threshold), so CLI
runs get the same plans the tests pin.
"""

from __future__ import annotations

import argparse
import sys

_DEFAULT_SF = "/root/testdata/sf0.01"


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tms_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list catalog queries")
    lp.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain"):
        rp = sub.add_parser(name)
        rp.add_argument("query")
        rp.add_argument("--sf-dir", default=_DEFAULT_SF)
        if name == "run":
            rp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser("sql", help="raw SQL over the registered tables")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default=_DEFAULT_SF)
    sp.add_argument("--limit", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)

    from tms_etl_spark import catalog

    catalog.load_all()

    if args.cmd == "list":
        names = [n for n in sorted(catalog.QUERIES) if args.substring in n]
        for n in names:
            mark = "oracle" if n in catalog.ORACLES else "rows-only"
            print(f"{n}\t{mark}")
        print(f"{len(names)} queries", file=sys.stderr)
        return 0

    # validate the query name BEFORE paying SparkSession startup —
    # a typo should fail instantly, like the `list` path does
    if args.cmd in ("run", "explain") and args.query not in catalog.QUERIES:
        print(f"unknown query: {args.query!r}", file=sys.stderr)
        return 2

    from tms_etl_spark.session import get_spark

    spark = get_spark(app_name=f"cli_{args.cmd}")
    if args.cmd in ("run", "explain"):
        df = catalog.QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "sql":
        from tms_etl_spark.sources.tables import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
