"""Bloom filter: distributed build, map-only probe.

Same design move as `operators/cms.py` — the filter builds AS a
DataFrame (each member key sets ``depth`` bits, ``bucket_i =
xxhash64(key, i) mod m``; the filter is the DISTINCT set-bit table,
mergeable by UNION+DISTINCT). The probe side then must NOT shuffle:
a 100 TB corpus checked against a bounded reference set (benchmark
ids, known-bad URLs, already-ingested keys) should stay map-only.
So the set-bit table — bounded filter metadata, ≤ m rows — is packed
driver-side into ``m/64`` longs and shipped as an array literal;
each probe row tests its ``depth`` bits with JVM-side element_at +
shiftleft, no join, no exchange, no Python.

Guarantee: no false negatives, ever; false positives at the standard
``(1 - e^(-kn/m))^k`` rate. Size m for the member count (bits ≈
1.44 · n · log2(1/fp)); the literal is m/8 bytes — 1 MB covers ~5M
members at 1% FP, well inside broadcast budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int, depth: int
) -> DataFrame:
    """Member keys → the set-bit table (≤ ``m_bits`` rows, one column
    ``bucket``). One distinct-aggregation; mergeable with another
    filter's table by union+distinct."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(key_col), rows)
        .select(
            F.pmod(F.xxhash64(F.col(key_col), F.col("row")), F.lit(m_bits)).alias(
                "bucket"
            )
        )
        .distinct()
    )


def pack_bloom(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect the set-bit table (bounded: ≤ m_bits rows — this is
    the filter itself, not data) and pack it into m/64 signed longs
    for literal shipping."""
    words = [0] * ((m_bits + 63) // 64)
    for r in bloom.collect():
        b = int(r["bucket"])
        words[b // 64] |= 1 << (b % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    words: list[int],
    probes: DataFrame,
    key_col: str,
    m_bits: int,
    depth: int,
) -> DataFrame:
    """Append ``bloom_hit`` to ``probes``: true iff every one of the
    key's ``depth`` buckets is set. Pure map-side bit tests against
    the packed-word array literal — zero exchanges added."""
    out = probes.withColumn("__bloom_words", F.lit(words))
    hit = F.lit(True)
    for i in range(depth):
        out = out.withColumn(
            f"__b{i}",
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)),
        )
        hit = hit & F.expr(
            f"(element_at(__bloom_words, CAST(__b{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(__b{i} % 64 AS INT))) != 0"
        )
    return out.withColumn("bloom_hit", hit).drop(
        "__bloom_words", *[f"__b{i}" for i in range(depth)]
    )
