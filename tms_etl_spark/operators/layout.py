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


def zorder_key_k(cols, bits: int | None = None) -> Column:
    """Morton interleave of K dimensions (the 2-D `zorder_key`
    generalized): dimension d's bit b lands at output position
    ``b*K + d``. ``bits`` defaults to the most that fit a 64-bit lane
    (63 // K — e.g. 21 bits/dim for 3 columns, 15 for 4). Built as a
    flat OR of shift/mask terms — pure JVM expressions inside
    whole-stage codegen, evaluated once per row at write time; no
    UDFs. Callers bucketize wide domains first, same contract as the
    2-D form."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs at least 2 columns")
    bits = bits if bits is not None else 63 // k
    if bits * k > 63:
        raise ValueError(f"{bits} bits x {k} dims exceeds a 64-bit lane")
    out = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)), b * k + d
                )
            )
    return out.alias("zvalue")


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

    Implementation: the 4-state FSM form (Hacker's Delight fig.
    16-* ``hil_xy2d`` — public domain): per bit level, a 4-entry
    lookup packed into an integer constant yields the 2-bit output
    digit and the next state, so each level is ~6 branch-free integer
    ops instead of the textbook rotate/reflect conditionals
    (constants validated exhaustively against the textbook walk in
    tests). Expressed as an ``F.aggregate`` fold over the bit levels
    with a (state, d) accumulator — the fold keeps the expression
    tree LINEAR in ``bits``, where an unrolled withColumn chain would
    inline to ~3^bits nodes after projection collapse; the fold is
    interpreted — use ``with_hilbert_key`` (broadcast tile joins)
    on hot paths; this pure-Column form is the portable
    reference. The identical
    integer arithmetic runs on any SQL engine (`sql_hilbert_cte`)."""
    mask = F.lit((1 << bits) - 1)
    xc = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(mask)
    yc = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(mask)
    return _fsm_fold(xc, yc, bits, F.lit(0).cast("long"))["d"].alias("hvalue")


def _fsm_fold(xc: Column, yc: Column, bits: int, init_state: Column) -> Column:
    """The (state, d) FSM fold over ``bits`` levels; returns the final
    struct so callers can read the exit state too (the tile builder
    needs it)."""
    init = F.struct(init_state.alias("s"), F.lit(0).cast("long").alias("d"))
    masks = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    digit_arr = F.array(
        *[F.lit((0x361E9CB4 >> (2 * r)) & 3).cast("long") for r in range(16)]
    )
    state_arr = F.array(
        *[F.lit((0x8FE65831 >> (2 * r)) & 3).cast("long") for r in range(16)]
    )

    def step(acc, m):
        bx = (xc.bitwiseAND(m) > 0).cast("long")
        by = (yc.bitwiseAND(m) > 0).cast("long")
        row = (acc["s"] * 4 + bx * 2 + by + 1).cast("int")  # 1-based
        return F.struct(
            F.element_at(state_arr, row).alias("s"),
            (acc["d"] * 4 + F.element_at(digit_arr, row)).alias("d"),
        )

    return F.aggregate(masks, init, step)


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


def _hilbert_tile_df(spark, tile_bits: int = 8) -> DataFrame:
    """FSM tile table AS A DATAFRAME: for every (state, x_byte,
    y_byte), the 2·tile_bits output digits and the exit state — the
    per-byte unrolling of the 4-state machine in ``hilbert_key``.
    Built IN SPARK (spark.range + the interpreted fold over the
    4·2^16 tile rows — milliseconds), never as a Python tuple list:
    createDataFrame on 262k driver-side tuples was measured as the
    dominant cost of the tile-join path."""
    side = 1 << tile_bits
    base = spark.range(4 * side * side).select(
        (F.col("id") / (side * side)).cast("long").alias("s0"),
        ((F.col("id") / side) % side).cast("long").alias("xb"),
        (F.col("id") % side).cast("long").alias("yb"),
    )
    folded = _fsm_fold(
        F.col("xb"), F.col("yb"), tile_bits, F.col("s0")
    )
    return base.select(
        F.col("s0").cast("int").alias("s"),
        F.col("xb").cast("int").alias("xb"),
        F.col("yb").cast("int").alias("yb"),
        folded["d"].alias("d8"),
        folded["s"].cast("int").alias("ns"),
    )


def with_hilbert_key(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    out: str = "hvalue",
) -> DataFrame:
    """16-bit Hilbert key via TWO broadcast joins against the
    precomputed 8-bit FSM tile table — the codegen-fast form of
    ``hilbert_key`` (the pure-Column fold is interpreted per level;
    the tile walk replaces 16 interpreted steps with two
    BroadcastHashJoins over a ~262k-row table, measured ~4× faster
    at sf0.1 — and the residual cost is the per-query tile-table
    broadcast, which a real deployment builds once and reuses). Identical output to
    ``hilbert_key(x, y, bits=16)`` (pinned by test). Scale shape: the
    tile table broadcasts once; the fact side stays map-only."""
    spark = df.sparkSession
    tiles = _hilbert_tile_df(spark, 8)
    xc = (F.col(x) if isinstance(x, str) else x).cast("long").bitwiseAND(
        F.lit(0xFFFF)
    )
    yc = (F.col(y) if isinstance(y, str) else y).cast("long").bitwiseAND(
        F.lit(0xFFFF)
    )
    keyed = df.withColumn("__xh", F.shiftright(xc, 8).cast("int")).withColumn(
        "__yh", F.shiftright(yc, 8).cast("int")
    ).withColumn("__xl", xc.bitwiseAND(F.lit(0xFF)).cast("int")).withColumn(
        "__yl", yc.bitwiseAND(F.lit(0xFF)).cast("int")
    )
    hi = tiles.select(
        F.col("s").alias("__s0"),
        F.col("xb").alias("__xh"),
        F.col("yb").alias("__yh"),
        F.col("d8").alias("__dh"),
        F.col("ns").alias("__s1"),
    )
    lo = tiles.select(
        F.col("s").alias("__s1"),
        F.col("xb").alias("__xl"),
        F.col("yb").alias("__yl"),
        F.col("d8").alias("__dl"),
    )
    return (
        keyed.withColumn("__s0", F.lit(0))
        .join(F.broadcast(hi), ["__s0", "__xh", "__yh"])
        .join(F.broadcast(lo), ["__s1", "__xl", "__yl"])
        .withColumn(out, F.shiftleft("__dh", 16) + F.col("__dl"))
        .drop("__s0", "__s1", "__xh", "__yh", "__xl", "__yl", "__dh", "__dl")
    )
