"""Round-3 batch 4: Z-order layout, sketch queries, epoch shuffle and
weighted sampling — property tests beyond the differential oracles."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tms_etl_spark.operators.layout import write_zordered, zorder_key
from tms_etl_spark.operators.sampling import epoch_shuffle, weighted_sample
from tms_etl_spark.sources.tables import load_table


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 42)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["zvalue"]
        for r in df.select("x", "y", zorder_key("x", "y")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave(x, y)


def test_zorder_write_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / "zordered")
    write_zordered(
        li.withColumn("x", F.col("l_partkey") % 65536).withColumn(
            "y", F.col("l_suppkey") % 65536
        ),
        out,
        "x",
        "y",
        n_files=4,
    )
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("zvalue").alias("lo"), F.max("zvalue").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 2  # range partitioner actually split
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # z-ranges never overlap across files


def test_epoch_shuffle_is_permutation_and_differs_by_epoch(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    sh = epoch_shuffle(d, id_col="doc_id", epochs=[0, 1])
    pdf = sh.toPandas()
    for epoch, grp in pdf.groupby("epoch"):
        assert sorted(grp["position"]) == list(range(1, n + 1))
        assert grp["doc_id"].nunique() == n
    order0 = pdf[pdf.epoch == 0].sort_values("position")["doc_id"].tolist()
    order1 = pdf[pdf.epoch == 1].sort_values("position")["doc_id"].tolist()
    assert order0 != order1  # independent permutations
    # reproducible: the permutation is a pure function of the data
    again = (
        epoch_shuffle(d, id_col="doc_id", epochs=[0])
        .toPandas()
        .sort_values("position")["doc_id"]
        .tolist()
    )
    assert again == order0


def test_weighted_sample_prefers_heavy_rows(spark):
    # two weight classes, 500 rows each: weight 100 vs weight 1 —
    # the heavy class must dominate a k=100 sample
    rows = [(i, 100 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = weighted_sample(df, id_col="id", weight_col="w", k=100).collect()
    heavy = sum(1 for r in got if r["w"] == 100)
    assert heavy > 80
    # determinism: same draw twice
    again = weighted_sample(df, id_col="id", weight_col="w", k=100).collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in again)


def test_weighted_sample_matches_python_replay(spark):
    rows = [(i, (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = sorted(
        r["id"] for r in weighted_sample(df, "id", "w", k=25).collect()
    )

    def u(i: int) -> float:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 0xFFFFFFFF

    expect = sorted(
        i for i, w in sorted(rows, key=lambda t: (u(t[0]) / t[1], t[0]))[:25]
    )
    assert got == expect


def _xy2d_ref(bits, x, y):
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_and_is_bijective(spark):
    """Spark fold == classic xy2d walk on the full 64x64 grid; the
    4096 keys are a permutation of 0..4095 (bijectivity) and every
    consecutive pair of keys is grid-adjacent — the Hilbert locality
    property Z-order lacks."""
    from tms_etl_spark.operators.layout import hilbert_key

    grid = (
        spark.range(64)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(64).select(F.col("id").alias("y")))
    )
    rows = grid.select("x", "y", hilbert_key("x", "y", bits=6)).collect()
    assert all(r["hvalue"] == _xy2d_ref(6, r["x"], r["y"]) for r in rows)
    ds = sorted(r["hvalue"] for r in rows)
    assert ds == list(range(4096))
    pos = {r["hvalue"]: (r["x"], r["y"]) for r in rows}
    assert all(
        abs(pos[i][0] - pos[i + 1][0]) + abs(pos[i][1] - pos[i + 1][1]) == 1
        for i in range(4095)
    )


def test_hilbert_key_full_width_spot_check(spark):
    """bits=16 (the catalog form) against the reference on scattered
    points across the full 65536^2 domain."""
    from tms_etl_spark.operators.layout import hilbert_key

    pts = [(0, 0), (65535, 65535), (12345, 54321), (1, 65534), (40000, 7)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", hilbert_key("x", "y", bits=16)).collect()
    for r in rows:
        assert r["hvalue"] == _xy2d_ref(16, r["x"], r["y"]), (r["x"], r["y"])


def test_hilbert_tile_join_equals_fold(spark):
    """The broadcast-tile form must equal the pure-Column FSM fold on
    a random scatter across the full 16-bit domain."""
    from tms_etl_spark.operators.layout import hilbert_key, with_hilbert_key

    pts = spark.range(2000).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0xFFFF))).alias("y"),
    )
    fold = pts.select("x", "y", hilbert_key("x", "y", bits=16)).collect()
    tile = {
        (r["x"], r["y"]): r["hvalue"]
        for r in with_hilbert_key(pts, "x", "y").collect()
    }
    assert all(tile[(r["x"], r["y"])] == r["hvalue"] for r in fold)
