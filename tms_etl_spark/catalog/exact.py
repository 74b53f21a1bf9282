"""Helpers that make float results bit-identical between Spark and DuckDB.

Problem: ``SUM(double)`` is order-dependent; Spark's partial/final
aggregation over N partitions and DuckDB's accumulate in different
orders, so the last few ulps differ and an exact value-hash comparison
fails even though both answers are "right".

Fix: route double arithmetic through DECIMAL. ``CAST(x AS
DECIMAL(18,4))`` is deterministic (both engines round-to-nearest the
same double bits), decimal addition is exact and associative, and the
final ``CAST(... AS DOUBLE)`` of an exact decimal is deterministic.
Result: bit-identical aggregates no matter the partitioning — which is
also the honest definition of a reproducible metric at 100 TB.

The reference's analog is its ``float(x or 0)`` lazy-cast convention
(/root/reference/src/main_01.py:447-449): all arithmetic happens after
one explicit, documented coercion point.

PRECONDITION — dsum/dec inputs must be CLEAN values with ≤3 true
decimal digits (e.g. 2-decimal money straight off parquet). A double
with a full binary tail (anything that went through a float32 upcast,
a division, or transcendental math) lands arbitrarily close to a
DECIMAL(18,4) rounding boundary, and Spark's BigDecimal HALF_UP and
DuckDB's double→decimal cast can disagree by an ulp ACROSS DUCKDB
VERSIONS (observed: r9 driver vs local DuckDB 1.0.0 on
lakehouse_type_widening's float-upcast balances). If the input is
dirty, ROUND(x, 2) it first on BOTH sides — when the true value is
recoverable (≤6 significant digits for float32) the round-trip is
lossless and tie-free — or use ``dsum8``/``dsum8r`` with a scale that
dominates the noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"  # 4 fractional digits: enough for money/measure data
DEC_WIDE = "decimal(28,8)"  # for products: true value can carry 4-6 decimals


def dec(col: Column | str) -> Column:
    """Deterministic double→decimal coercion point.

    Scale 4 is only midpoint-free when the true value has ≤3 decimal
    digits (source data is 2-decimal); for *products* of such values
    use ``dec8`` — a 3-way product carries 6 true decimals, and
    rounding it at scale 4 lands exactly on .5 midpoints where Spark
    (HALF_UP) and DuckDB disagree.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dec8(col: Column | str) -> Column:
    """Wide-scale coercion for derived/product values (midpoint-free
    up to 7 true decimal digits)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_WIDE)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, order-independent SUM over a double column → double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def dsum8(col: Column | str, alias: str) -> Column:
    """Exact SUM of a product-valued column (scale-8 coercion), with
    the result rounded back to scale 4 before the double cast.

    The cross-engine invariant for the final decimal→double cast is
    ``value × 10^scale ≤ 2^53``: within it, both engines do one
    correctly-rounded conversion; beyond it DuckDB's int128→double→
    divide path double-rounds and drifts an ulp from Spark's
    BigDecimal path. A scale-8 sum crosses 2^53 at only ~9e7, so the
    sum is rounded (exactly, in decimal space — HALF_UP and DuckDB's
    half-away agree for positives) to scale 4 first, good to ~9e11.
    """
    return F.round(F.sum(dec8(col)), 4).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: decimal sum, then a single double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def sql_dsum8(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,8))), 4) AS DOUBLE) AS {alias}"
    )


def dsum8r(col: Column | str, alias: str, scale: int) -> Column:
    """Exact SUM of a product-valued column rounded to ``scale``
    fractional digits before the double cast.

    Use when the sum's magnitude would break ``dsum8``'s scale-4
    ``value × 10^4 ≤ 2^53`` invariant (e.g. sums of squared prices:
    ~1e13 at sf0.01). Pick the largest ``scale`` that keeps
    ``max_sum × 10^scale`` under 2^53; the decimal-space round is
    exact and identical cross-engine (HALF_UP == half-away for
    positives), so the final cast stays one correctly-rounded
    conversion on both sides."""
    return F.round(F.sum(dec8(col)), scale).cast("double").alias(alias)


def sql_dsum8r(expr: str, alias: str, scale: int) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,8))), {scale})"
        f" AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def decimal_dot(a: Column, b: Column) -> Column:
    """The embedding-arithmetic exactness contract: per-component
    products cast float→double→DECIMAL(28,14) so their SUM is
    order-independent (the same move as ``dec``/``dec8`` for money
    columns, at the scale float32 components need). Every cosine /
    dot-product catalog query routes through THIS function — one
    place to change precision without the queries drifting apart."""
    return (a.cast("double") * b.cast("double")).cast("decimal(28,14)")
