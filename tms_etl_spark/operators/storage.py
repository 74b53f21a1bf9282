"""Storage-layout & sampling operators — the housekeeping a 100 TB
lake actually needs.

- ``compact_small_files``: rewrite a parquet prefix into
  target-sized files (the small-files problem: a micro-batch import
  like tms.pipeline produces one file per trigger per partition;
  listing cost and scan task count grow until someone compacts).
- ``write_sorted_parquet``: range-partition + sort-within-partitions
  on layout keys before writing, so min/max row-group statistics
  become selective (poor-man's clustering/Z-order on one axis) and
  later scans prune row groups, not just partitions.
- ``sample_stratified``: per-class sampling with explicit fractions
  (training-data class balancing), seed-deterministic.
- ``hash_split``: deterministic train/validation/test assignment from
  a stable id digest — reproducible across runs, partitionings and
  cluster layouts, and stable under corpus growth (a doc keeps its
  split forever; sampling by fraction would reshuffle everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Rewrite ``path`` (parquet) into ~``target_file_bytes`` files.

    Output file count comes from the listing metadata (sum of file
    sizes / target) — a driver-side O(#files) listing, NOT an extra
    ``count()`` pass over the data. The swap goes through the Hadoop
    FileSystem (staging dir + delete/rename), which works on local,
    HDFS and object-store paths alike; real object-store deployments
    should prefer a manifest/table-format commit. At cluster scale run
    per-partition to keep the rewrite incremental."""
    from tms_etl_spark.sources.fs import replace_dir, total_size

    bytes_now = total_size(spark, path, pattern="*.parquet")
    n_files = max(1, -(-bytes_now // target_file_bytes))  # ceil div
    (
        spark.read.parquet(path)
        .repartition(int(n_files))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path + ".compact")
    )
    replace_dir(spark, path + ".compact", path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    layout_cols: list[str],
    num_files: int | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Cluster data on ``layout_cols`` at write time: range-partition
    so each file owns a contiguous key range, sort within partitions
    so row-group min/max stats are tight. Scans filtering on the
    layout keys then skip whole files/row-groups."""
    parts = num_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = df.repartitionByRange(int(parts), *layout_cols).sortWithinPartitions(
        *layout_cols
    )
    out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    ).parquet(path)


def sample_stratified(
    df: DataFrame, class_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-class Bernoulli sampling (class balancing). Deterministic
    for a fixed seed and input; distributed (no driver collection)."""
    return df.sampleBy(class_col, fractions=fractions, seed=seed)


def hash_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    validation: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment from a digest of the id.

    Uses the first 8 hex chars of md5(id) as a uniform 32-bit value —
    stable across engines, runs, and partitionings (xxhash64 would be
    Spark-specific). Buckets: [0, train) → train, [train,
    train+validation) → validation, rest → test.
    """
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(0xFFFFFFFF))
    return df.withColumn(
        out_col,
        F.when(u < train, "train")
        .when(u < train + validation, "validation")
        .otherwise("test"),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    content_col: str,
    train: float = 0.8,
    validation: float = 0.1,
) -> DataFrame:
    """Train/test split that cannot leak exact duplicates across the
    boundary: rows are grouped by a content digest, every member of a
    duplicate group inherits the split of the group's representative
    (min id), and the representative is assigned via the same
    md5-uniform ``hash_split`` uses.

    A plain per-id split puts two byte-identical documents on
    opposite sides of the train/eval boundary with probability
    2·p·(1-p) each — at 100 TB that is millions of leaked eval
    documents. Keying the split on the content group closes that
    hole for exact dups; near-dup leakage is the follow-on job of
    the MinHash cluster pass (``operators.graph.dedup_clusters``),
    whose cluster id can be fed back through ``group_key_col``-style
    splitting the same way.

    The representative is a ``groupBy(digest).agg(min(id))``
    AGGREGATION joined back on the digest — not a ``min() over
    (partition by digest)`` window: a boilerplate document duplicated
    millions of times makes the digest a hot key, which the window
    would buffer in ONE task while the aggregation map-side combines
    and the join-back is AQE-skew-splittable. The split itself stays
    a pure projection.
    """
    with_h = df.withColumn(
        "__h", F.md5(F.col(content_col).cast("string"))
    )
    reps = with_h.groupBy("__h").agg(F.min(F.col(id_col)).alias("__grp_key"))
    with_grp = with_h.join(reps, "__h").drop("__h")
    split = hash_split(
        with_grp.withColumnRenamed("__grp_key", "__sid"),
        "__sid",
        train=train,
        validation=validation,
    )
    return split.drop("__sid")


def kfold_assign(df: DataFrame, id_col: str, k: int = 5) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    ⌊u·k⌋ of the same md5-uniform digest ``hash_split`` uses, clamped
    to k-1 (u=1.0 exactly would otherwise spill into fold k). A row
    keeps its fold across runs, engines, partitionings, and corpus
    growth — the property RNG-based assignment lacks."""
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(0xFFFFFFFF))
    fold = F.least(F.floor(u * k), F.lit(k - 1)).cast("int")
    return df.withColumn("fold", fold)
