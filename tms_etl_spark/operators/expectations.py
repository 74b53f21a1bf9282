"""Single-pass data-quality profiling (deequ-style, minus the JVM
dependency): compute a table's quality metrics — row count, per-column
null fractions, key uniqueness, range violations — in ONE aggregation
over ONE scan, returned long-format as (metric, value) rows.

Why one pass matters: the naive form (one query per check) scans the
table once per metric; at 100 TB a 12-check suite becomes 12 full
scans. Here every check compiles to a conditional aggregate inside a
single `agg(...)`, so the whole suite costs exactly one scan + one
1-row aggregate, and partial aggregation does the heavy lifting
map-side. The wide 1-row result is then unpivoted JVM-side (`stack`).

The reference hand-rolls the same idea per-table (shift-minutes
invariant, powered-off detection — `tms/quality.py`); this is the
generic engine form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    null_cols: Sequence[str] = (),
    unique_keys: Sequence[Sequence[str]] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
    custom: dict[str, Column] | None = None,
) -> DataFrame:
    """Quality metrics for ``df`` as (metric, value) rows.

    - ``null_cols``: emit ``null_frac:<col>`` per column;
    - ``unique_keys``: emit ``dup_rows:<k1+k2>`` = rows minus distinct
      key combinations (0 ⇔ the key is unique);
    - ``bounds``: emit ``oob:<col>`` = rows outside [lo, hi];
    - ``custom``: extra named aggregate expressions (must be
      aggregates producing one value).

    Values are doubles; counts are exact below 2^53. Fractions divide
    two exact longs, so any engine computing the same division gets
    the bit-identical double — the catalog query's oracle relies on
    this.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("double").alias("n_rows")]
    for c in null_cols:
        aggs.append(
            (
                F.count(F.when(F.col(c).isNull(), 1)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"null_frac:{c}")
        )
    for keys in unique_keys:
        name = "+".join(keys)
        # struct-wrapped so tuples containing NULL keys still count as
        # distinct values (bare count_distinct(k1, k2) drops them,
        # which would overstate dup_rows on nullable keys and diverge
        # from the oracle's COUNT(DISTINCT (k1, k2)))
        aggs.append(
            (
                F.count(F.lit(1)).cast("double")
                - F.count_distinct(
                    F.struct(*[F.col(k) for k in keys])
                ).cast("double")
            ).alias(f"dup_rows:{name}")
        )
    for c, (lo, hi) in (bounds or {}).items():
        aggs.append(
            F.count(
                F.when((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)), 1)
            )
            .cast("double")
            .alias(f"oob:{c}")
        )
    for name, expr in (custom or {}).items():
        aggs.append(expr.cast("double").alias(name))

    wide = df.agg(*aggs)
    names = [f.name for f in wide.schema.fields]
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {pairs}) AS (metric, value)"
    )


def assert_expectations(
    df: DataFrame,
    max_null_frac: float = 0.0,
    max_dup_rows: int = 0,
    max_oob: int = 0,
    **profile_kwargs,
) -> list[str]:
    """Run :func:`profile` and return the list of violated
    expectations (empty = table is clean). One scan, driver receives
    only the metric rows."""
    rows = profile(df, **profile_kwargs).collect()
    bad: list[str] = []
    for r in rows:
        m, v = r["metric"], r["value"]
        if m.startswith("null_frac:") and v > max_null_frac:
            bad.append(f"{m}={v:.6f}")
        elif m.startswith("dup_rows:") and v > max_dup_rows:
            bad.append(f"{m}={int(v)}")
        elif m.startswith("oob:") and v > max_oob:
            bad.append(f"{m}={int(v)}")
    return bad


def schema_drift(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema-drift report between two snapshots of a table: columns
    added/removed, type changes, nullability loosening. Pure METADATA
    comparison — zero data scanned (at 100 TB this runs before any
    expensive reconciliation and gates whether a downstream consumer
    even attempts the read). Returns a list of
    ``{"column", "change", "old", "new"}`` dicts, empty = compatible.
    """
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in sorted(n.keys() - o.keys()):
        out.append(
            {"column": name, "change": "added", "old": None,
             "new": n[name].dataType.simpleString()}
        )
    for name in sorted(o.keys() - n.keys()):
        out.append(
            {"column": name, "change": "removed",
             "old": o[name].dataType.simpleString(), "new": None}
        )
    for name in sorted(o.keys() & n.keys()):
        ot, nt = o[name].dataType.simpleString(), n[name].dataType.simpleString()
        if ot != nt:
            out.append(
                {"column": name, "change": "type_changed", "old": ot, "new": nt}
            )
        elif not o[name].nullable and n[name].nullable:
            out.append(
                {"column": name, "change": "nullable_loosened",
                 "old": "not null", "new": "nullable"}
            )
    return out


def quarantine_split(
    df: DataFrame, predicate
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) row split on an expectation predicate —
    the writer pattern where violating rows land in a quarantine sink
    for inspection instead of failing the batch or silently dropping.
    Both frames share one lineage; Catalyst pushes the complementary
    filters into the same scan when both are consumed."""
    from pyspark.sql import functions as F

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.where(pred), df.where(~pred | pred.isNull())
