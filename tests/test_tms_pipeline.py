"""Reference-semantics tests (SURVEY.md §5.2): TMS-shaped fixtures
with hand-computed goldens — positional parsing, BOM/encoding, empty
string coercion, desligado predicate incl. borderlines, merge
idempotence, first-write-wins, newest-file-wins precedence.
"""

from __future__ import annotations

import codecs

import pytest
from pyspark.sql import functions as F

from tms_etl_spark.tms.pipeline import import_daily, prepare_batch
from tms_etl_spark.tms.quality import is_tear_desligado
from tms_etl_spark.tms.schema import DAILY_COLUMNS, with_types
from tms_etl_spark.tms.source import read_daily


def _row(data_turno, tear, artigo="ART-1", rpm="550", ef="85.5", func="400",
         par="40", extra_cols=56):
    head = [data_turno, tear, artigo, "", "GEN-1", rpm, ef, func, par]
    return ",".join(head + ["0"] * extra_cols)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("tmslake")
    d = root / "2024-01" / "daily"
    d.mkdir(parents=True)
    rows = [
        _row("2024-01-05.A", "00001"),                       # normal
        _row("2024-01-05.C", "00002", func="0", par="440"),  # desligado
        _row("2024-01-05.C", "00003", func="0", par="399"),  # borderline: NOT flagged
        _row("2024-01-05.C", "00004", func="0.1", par="440"),  # borderline: NOT flagged
        _row("2024-01-05.B", "00005", rpm=""),               # empty-string numeric → 0
        "short,row",                                          # arity<3 → dropped
        _row("2024-01-05.A", "00006")[: len(_row('x', 'y')) - 80],  # truncated tail → nulls → 0
    ]
    (d / "2024-01-05.csv").write_text("\n".join(rows), encoding="utf-8")
    # BOM file (utf-8-sig)
    (d / "2024-01-06.csv").write_bytes(
        codecs.BOM_UTF8 + _row("2024-01-06.A", "00001").encode("utf-8")
    )
    return str(root)


def test_positional_schema():
    assert len(DAILY_COLUMNS) == 71
    assert DAILY_COLUMNS[0] == "DataTurno"
    assert DAILY_COLUMNS[15] == "QtdParadasUrdume"
    assert DAILY_COLUMNS[34] == "MinParadasOutras"
    assert DAILY_COLUMNS[35] == "Wf11"
    assert DAILY_COLUMNS[70] == "MinGen16"


def test_read_daily_parses_and_coerces(spark, lake):
    df = read_daily(spark, lake)
    rows = {r["Tear"]: r for r in df.collect()}
    # BOM stripped: first column parsed cleanly
    assert "00001" in rows
    assert rows["00001"]["DataTurno"] in ("2024-01-05.A", "2024-01-06.A")
    # empty string numeric coerced to 0
    assert rows["00005"]["Rpm"] == 0.0
    assert rows["00005"]["Eficiencia"] == 85.5
    # derived columns
    assert rows["00002"]["turno"] == "C"
    assert rows["00002"]["month"] == "2024-01"
    assert str(rows["00002"]["data"]) == "2024-01-05"


def test_desligado_predicate(spark, lake):
    df = read_daily(spark, lake)
    flagged = {
        r["Tear"]
        for r in df.where(is_tear_desligado()).select("Tear").collect()
    }
    assert flagged == {"00002"}  # borderlines 00003/00004 excluded


def test_arity_filter_drops_short_rows(spark, lake):
    batch = prepare_batch(read_daily(spark, lake))
    tears = {r["Tear"] for r in batch.select("Tear").collect()}
    assert "short" not in tears and "row" not in tears


def test_truncated_row_trailing_nulls_coerced(spark, lake):
    df = read_daily(spark, lake)
    r = df.where(F.col("Tear") == "00006").collect()
    if r:  # truncated row keeps first fields, trailing → 0.0
        assert r[0]["MinGen16"] == 0.0


def test_import_idempotent(spark, lake, tmp_path):
    target = str(tmp_path / "fact")
    s1 = import_daily(spark, lake, target)
    t1 = spark.read.parquet(target).orderBy("DataTurno", "Tear").collect()
    s2 = import_daily(spark, lake, target)  # replay the same files
    t2 = spark.read.parquet(target).orderBy("DataTurno", "Tear").collect()
    assert s1.table_rows == s2.table_rows
    assert t1 == t2  # T2: exactly-once effective under replay


def test_first_write_wins_for_desligado(spark, lake, tmp_path):
    target = str(tmp_path / "fact")
    import_daily(spark, lake, target)
    # A real record for 00002's shift lands first; a later desligado
    # import must NOT overwrite it.
    real = spark.read.parquet(target).where(
        (F.col("Tear") == "00002") & (F.col("DataTurno") == "2024-01-05.C")
    )
    assert real.count() == 1
    before = real.collect()[0]["Eficiencia"]

    # new lake delivering a desligado row for the same key
    import pathlib

    lake2 = tmp_path / "lake2" / "2024-01" / "daily"
    pathlib.Path(lake2).mkdir(parents=True)
    (lake2 / "2024-01-05.csv").write_text(
        _row("2024-01-05.C", "00002", ef="0", func="0", par="440"), encoding="utf-8"
    )
    import_daily(spark, str(tmp_path / "lake2"), target)
    after_df = spark.read.parquet(target).where(
        (F.col("Tear") == "00002") & (F.col("DataTurno") == "2024-01-05.C")
    )
    assert after_df.count() == 1
    assert after_df.collect()[0]["Eficiencia"] == before  # unchanged

    # but a NON-desligado update for another key DOES overwrite
    lake3 = tmp_path / "lake3" / "2024-01" / "daily"
    pathlib.Path(lake3).mkdir(parents=True)
    (lake3 / "2024-01-05.csv").write_text(
        _row("2024-01-05.A", "00001", ef="42.0"), encoding="utf-8"
    )
    import_daily(spark, str(tmp_path / "lake3"), target)
    updated = spark.read.parquet(target).where(
        (F.col("Tear") == "00001") & (F.col("DataTurno") == "2024-01-05.A")
    )
    assert updated.collect()[0]["Eficiencia"] == 42.0


def test_newest_file_wins_within_batch(spark, tmp_path):
    import time

    d = tmp_path / "lk" / "2024-02" / "daily"
    d.mkdir(parents=True)
    (d / "2024-02-01.csv").write_text(
        _row("2024-02-01.A", "00009", ef="10.0"), encoding="utf-8"
    )
    time.sleep(1.1)  # distinct mtimes
    (d / "2024-02-02.csv").write_text(
        _row("2024-02-01.A", "00009", ef="99.0"), encoding="utf-8"
    )
    batch = prepare_batch(read_daily(spark, str(tmp_path / "lk")))
    rows = batch.where(F.col("Tear") == "00009").collect()
    assert len(rows) == 1
    assert rows[0]["Eficiencia"] == 99.0


def test_latin1_encoding_root(spark, tmp_path):
    d = tmp_path / "l1" / "2024-03" / "daily"
    d.mkdir(parents=True)
    (d / "2024-03-01.csv").write_bytes(
        _row("2024-03-01.A", "00007", artigo="TECIDO-AÇO").encode("latin-1")
    )
    df = read_daily(spark, str(tmp_path / "l1"), encoding="ISO-8859-1")
    assert df.collect()[0]["Artigo"] == "TECIDO-AÇO"


def test_month_pruning(spark, tmp_path):
    for m in ("2024-01", "2024-02"):
        d = tmp_path / "pr" / m / "daily"
        d.mkdir(parents=True)
        (d / "f.csv").write_text(_row(f"{m}-01.A", "00001"), encoding="utf-8")
    df = read_daily(spark, str(tmp_path / "pr"), months=["2024-02"])
    assert {r["month"] for r in df.select("month").collect()} == {"2024-02"}


def test_shift_minutes_invariant(spark, lake):
    from tms_etl_spark.tms.quality import shift_minutes_violations
    from tms_etl_spark.tms.source import read_daily
    from tms_etl_spark.tms.pipeline import prepare_batch

    batch = prepare_batch(read_daily(spark, lake))
    bad = shift_minutes_violations(batch)
    # fixture rows are built with Funcionando+Parado == 440 except the
    # truncated row (0+0); the validator must flag exactly those
    tears = {r["Tear"] for r in bad.select("Tear").collect()}
    assert "00001" not in tears
    for r in bad.collect():
        assert r["__shift_total"] < 400 or r["__shift_total"] > 480


def test_snapshot_diff_classifies_all_change_types(spark):
    from tms_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 33.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    # 1 unchanged (absent), 2 updated (s), 3 updated (NULL->value),
    # 4 deleted, 5 inserted
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}
