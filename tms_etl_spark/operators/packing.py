"""Sequence packing: assign documents to fixed token-budget training
sequences ("bins") with the next-fit rule — walk the documents of a
shard in id order, keep a running token total, start a new bin when
the next document would overflow the budget.

Reference analog: none (the reference has no training-data surface);
this is the example-packing step every LLM pre-training pipeline runs
between dedup/filtering and the tokenizer shards.

Why next-fit and not first-fit-decreasing: next-fit is the only
classic packing rule that is one-pass, O(1)-state and ORDER-
DETERMINISTIC — the assignment depends only on (shard, id order,
token counts), never on partitioning or timing, so the result is
bit-reproducible across engines and cluster layouts (the driver gate
recomputes it in DuckDB with a recursive CTE). FFD packs ~10% denser
but needs the whole shard sorted by size and per-bin state; when
density matters the shard is the unit you re-pack, not the corpus.

Scale shape: one shuffle of (id, n_tokens) — a few bytes per
document, NOT the payload — on the shard key; per-shard state is two
integers; output streams. Shard count is the parallelism knob: at
100 TB you raise ``n_shards`` to O(cluster cores) and every shard
packs independently. A document longer than the budget always lands
alone in its own bin (the running total can never accommodate it),
so oversize handling needs no special case — downstream truncation
policy is the tokenizer's job, flagged here via ``bin_tokens``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Per-document bin assignment: ``(shard, id, n_tokens, bin_id)``.

    The shard is the first 8 hex chars of md5(id) mod ``n_shards`` —
    the same engine-neutral digest as ``storage.hash_split``, so a
    document's shard (and therefore its bin) is stable across runs,
    engines and partitionings.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )
    # fresh StructType: StructType.add mutates cached schemas
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("bin_id", LongType()),
        ]
    )
    cap = int(budget)

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: executors may lack the package path
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, run = 0, 0
        for tok in pdf["n_tokens"]:
            t = int(tok)
            if run > 0 and run + t > cap:
                bin_id += 1
                run = 0
            run += t
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["shard", "id", "n_tokens", "bin_id"]]

    return src.groupBy("shard").applyInPandas(assign, schema=out_schema)


def bin_summary(packed: DataFrame) -> DataFrame:
    """Collapse a `pack_sequences` assignment to one row per bin:
    document count, token total, id span. Groups on the same
    (shard, bin_id) grain the packing emitted, so Catalyst plans it
    on the packing output without a second wide exchange of note."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
        F.min("id").cast("long").alias("first_doc"),
        F.max("id").cast("long").alias("last_doc"),
    )
