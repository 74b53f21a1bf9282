"""Multi-dimensional data layout: Z-order (Morton) clustering.

Reference analog: none — north-star storage-layout surface. Parquet
row-group pruning is one-dimensional: sorting by column A makes
filters on A cheap and filters on B full scans. Interleaving the bits
of A and B (the Z-order curve) gives every file a tight min/max range
on BOTH columns, so a 100 TB table pruned by either predicate skips
most files. This is the same layout trick Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``; here it is a pure-expression column plus a
range-partitioned sorted write — no engine extension needed.

The bit-spread uses the classic magic-mask doubling (public-domain
"Interleave bits by Binary Magic Numbers" from Sean Anderson's Bit
Twiddling Hacks), which both Spark and any SQL engine with integer
``<<``/``&``/``|`` evaluate identically — so the key is
oracle-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit → even-bit-positions spread masks (64-bit-safe constants).
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

MAX_BITS = 16


def _spread(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` to the even bit positions of a
    32-bit lane: abcd → 0a0b0c0d."""
    out = v.bitwiseAND(F.lit((1 << MAX_BITS) - 1))
    for shift, mask in _SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_key(x: Column | str, y: Column | str) -> Column:
    """Morton interleave of two 16-bit-bucketized dimensions: x takes
    the even output bits, y the odd. Monotone in the Z-curve, so
    sorting by it co-locates rows that are close in BOTH dimensions.
    Callers bucketize wider domains first (e.g. ``col % 65536`` or a
    range-rank); the key itself is pure JVM bit arithmetic."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    return _spread(xc).bitwiseOR(F.shiftleft(_spread(yc), 1)).alias("zvalue")


def sql_zvalue(x_expr: str, y_expr: str) -> str:
    """The identical interleave as ANSI SQL (for cross-engine
    verification): same masks, same shifts, same parse shape."""

    def spread(e: str) -> str:
        out = f"({e} & {(1 << MAX_BITS) - 1})"
        for shift, mask in _SPREAD_STEPS:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Z-curve: range-partition by the interleaved key (each output file
    owns a contiguous, non-overlapping z-range) and sort within
    partitions so row-group stats are tight too. Filters on either
    ``x`` or ``y`` then prune most files by footer min/max alone —
    the scan never reads them. One exchange total (the range
    partitioner's sample pass is metadata-sized)."""
    keyed = df.withColumn("zvalue", zorder_key(x, y))
    (
        keyed.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Hilbert-curve index of two ``bits``-bit-bucketized dimensions —
    the space-filling curve with strictly better locality than the
    Z-order above: consecutive indices are ALWAYS grid-adjacent
    (|Δx|+|Δy| = 1, pinned by test), where the Z-curve takes long
    diagonal jumps between quadrants, so Hilbert-clustered files have
    tighter min/max ranges on both columns at the same file count.

    Implementation: the classic xy→d bit-level walk (rotate/reflect a
    quadrant per level — public-domain algorithm as given on the
    Wikipedia "Hilbert curve" page), expressed as an ``F.aggregate``
    fold over the per-level cell sizes with a (x, y, d) struct
    accumulator. The fold keeps the expression tree LINEAR in
    ``bits`` — an unrolled withColumn chain would inline to ~3^bits
    nodes after projection collapse. All integer built-ins, so the
    identical chained-CTE arithmetic runs on any SQL engine
    (`sql_hilbert_cte`)."""
    mask = F.lit((1 << bits) - 1)
    xc = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(mask)
    yc = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(mask)
    init = F.struct(
        xc.alias("x"), yc.alias("y"), F.lit(0).cast("long").alias("d")
    )
    svals = F.array(
        *[F.lit(1 << b).cast("long") for b in range(bits - 1, -1, -1)]
    )

    def step(acc, s):
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        rx = F.when(acc["x"].bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(acc["y"].bitwiseAND(s) > 0, one).otherwise(zero)
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        nx = (
            F.when(
                ry == 0,
                F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"]),
            )
            .otherwise(acc["x"])
        )
        ny = (
            F.when(
                ry == 0,
                F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"]),
            )
            .otherwise(acc["y"])
        )
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(svals, init, step)["d"].alias("hvalue")


def sql_hilbert_cte(
    source_sql: str, x_expr: str, y_expr: str, bits: int = 16
) -> str:
    """The identical Hilbert walk as a chain of CTEs (one per bit
    level, so the SQL text stays linear in ``bits``): ``source_sql``
    must select the pass-through columns plus ``x_expr``/``y_expr``.
    Final relation = source columns + ``hvalue``."""
    mask = (1 << bits) - 1
    out = [
        f"it{bits} AS (SELECT *, CAST(({x_expr}) AS BIGINT) & {mask} AS hx,"
        f" CAST(({y_expr}) AS BIGINT) & {mask} AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM ({source_sql}))"
    ]
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        out.append(
            f"it{b} AS (SELECT * EXCLUDE (hx, hy, hd),"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s} - 1 - hy ELSE hy END) ELSE hx END AS hx,"
            f" CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s} - 1 - hx ELSE hx END) ELSE hy END AS hy,"
            f" hd + {s}::BIGINT * {s} * xor({rx} * 3, {ry}) AS hd"
            f" FROM it{b + 1})"
        )
    return (
        "WITH "
        + ",\n".join(out)
        + f"\nSELECT * EXCLUDE (hx, hy, hd), hd AS hvalue FROM it0"
    )
