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
