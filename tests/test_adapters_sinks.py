"""Adapter (S5-S7) and sink (S9-S12) tests — offline, fixture-driven."""

from __future__ import annotations

from pyspark.sql import functions as F

from tms_etl_spark.sources.adapters import (
    collection_events,
    looms_dimension,
    months_dimension,
    parse_select_options,
    parse_status_lines,
)
from tms_etl_spark.sources.sinks import (
    append_audit_event,
    export_excel,
    read_audit_log,
    write_month_kind_csv,
)

LOOM_HTML = """
<form><select name="loom">
<option value="1">Tear 01 - 172.17.1.1</option>
<option value="42">Tear 42 - 172.17.1.42</option>
<option value="999">Sem IP</option>
</select></form>
"""

MONTHS_HTML = """
<select name="shift"><option value="2024.02">2024.02</option>
<option value="2024.01">2024.01</option><option value="x">junk</option></select>
<select name="operator"><option value="2024.02">2024.02</option></select>
<select name="history"><option value="2024.01">2024.01</option></select>
"""

STATUS_LOG = """
Iniciando coleta...
00001 ---> Com Sucesso
00002 ---> Desligada
172.17.1.99 ---> Not Support TMS
00004 ---> Horario do Tear Incorreto
linha sem marcador
"""


def test_parse_select_options():
    opts = parse_select_options(LOOM_HTML, "loom")
    assert opts == [
        ("1", "Tear 01 - 172.17.1.1"),
        ("42", "Tear 42 - 172.17.1.42"),
        ("999", "Sem IP"),
    ]


def test_looms_dimension(spark):
    d = looms_dimension(spark, LOOM_HTML).orderBy("tear").collect()
    assert [r["tear"] for r in d] == ["00001", "00042", "00999"]
    assert d[1]["ip"] == "172.17.1.42"
    assert d[2]["ip"] is None


def test_months_dimension(spark):
    m = months_dimension(spark, MONTHS_HTML)
    rows = {(r["kind"], r["month"]) for r in m.collect()}
    assert rows == {
        ("shift", "2024.02"),
        ("shift", "2024.01"),
        ("operator", "2024.02"),
        ("history", "2024.01"),
    }  # junk value filtered by the YYYY.MM regex


def test_status_lines(spark):
    parsed = parse_status_lines(STATUS_LOG)
    assert ("00001", "Com Sucesso") in parsed
    assert ("172.17.1.99", "Not Support TMS") in parsed
    assert len(parsed) == 4  # non-status lines ignored
    ev = collection_events(spark, STATUS_LOG)
    counts = {r["status"]: r["count"] for r in ev.groupBy("status").count().collect()}
    assert counts["Com Sucesso"] == 1


def test_month_kind_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-01", "daily", "00001", 85.5), ("2024-02", "operator", "00002", 91.0)],
        "month string, kind string, tear string, eficiencia double",
    )
    out = str(tmp_path / "export")
    write_month_kind_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    # hive-style partition dirs exist
    import os

    assert os.path.isdir(f"{out}/month=2024-01/kind=daily")


def test_audit_log_append(spark, tmp_path):
    path = str(tmp_path / "audit")
    append_audit_event(spark, path, "run1", "collect", "ok")
    append_audit_event(spark, path, "run1", "import", "ok", detail="42 rows")
    log = read_audit_log(spark, path)
    assert log.count() == 2
    assert {r["step"] for r in log.collect()} == {"collect", "import"}


def test_excel_export_gated(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    ok = export_excel(df, str(tmp_path / "r.xlsx"))
    # openpyxl may or may not exist in the image; both paths are legal
    if ok:
        import os

        assert os.path.exists(tmp_path / "r.xlsx")


def test_jdbc_upsert_sql_generation():
    from tms_etl_spark.sources.jdbc import upsert_sql

    cols = ["DataTurno", "Tear", "Eficiencia"]
    keys = ["DataTurno", "Tear"]
    my = upsert_sql("tblDadosTeares", "tblDadosTeares__staging", cols, keys)
    assert my.startswith("INSERT INTO tblDadosTeares")
    assert "ON DUPLICATE KEY UPDATE Eficiencia = VALUES(Eficiencia)" in my
    assert "DataTurno = VALUES" not in my  # keys never updated

    pg = upsert_sql("t", "s", cols, keys, dialect="postgres")
    assert "ON CONFLICT (DataTurno, Tear) DO UPDATE SET" in pg
    assert "EXCLUDED.Eficiencia" in pg

    ansi = upsert_sql("t", "s", cols, keys, dialect="ansi")
    assert ansi.startswith("MERGE INTO t")
    assert "WHEN MATCHED THEN UPDATE SET t.Eficiencia = s.Eficiencia" in ansi


def test_format_roundtrips(spark, sf_dir, tmp_path):
    """parquet/ORC round-trip typed tables exactly; JSON/CSV
    round-trip through text with an explicit read schema."""
    from tms_etl_spark.sources.formats import read_table, write_table
    from tms_etl_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
    want = [tuple(r) for r in src.collect()]
    schema = src.schema

    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"t_{fmt}")
        write_table(src, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt, schema=schema)
        got = [tuple(r) for r in back.orderBy("n_nationkey").collect()]
        assert got == want, fmt


def test_format_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned ORC write produces partition dirs and the reader
    prunes them (directory-level, before any file I/O)."""
    import glob

    from tms_etl_spark.sources.formats import read_table, write_table
    from tms_etl_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_table(src, path, fmt="orc", partition_by=["o_orderstatus"])
    assert glob.glob(f"{path}/o_orderstatus=*")
    one = read_table(spark, path, fmt="orc").where("o_orderstatus = 'F'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan
    n_f = src.where("o_orderstatus = 'F'").count()
    assert one.count() == n_f


def test_format_rejects_unknown(spark, tmp_path):
    import pytest

    from tms_etl_spark.sources.formats import read_table, write_table

    df = spark.range(3)
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), fmt="xml")
