"""Collector protocol (fake CGI) + domain report tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_tms_pipeline import _row
from tms_etl_spark.sources.collector import (
    COLLECT_OK,
    EXPORT_CONFIRMED,
    EXPORT_OK,
    TmsCollector,
)
from tms_etl_spark.tms.pipeline import import_daily
from tms_etl_spark.tms.queries import (
    create_views,
    efficiency_by_loom_month,
    powered_off_report,
    shift_over_shift_delta,
    stop_reason_pareto,
)


class FakeCGI:
    """Minimal fake of the reference's Perl-CGI endpoints."""

    LOOM_PAGE = """<select name="loom">
    <option value="1">Tear 01</option><option value="2">Tear 02</option>
    </select>"""
    EXPORT_PAGE = """
    <select name="shift"><option value="2024.03">m</option>
      <option value="2024.02">m</option><option value="2024.01">m</option></select>
    <select name="operator"><option value="2024.03">m</option></select>
    <select name="history"><option value="2024.02">m</option></select>
    """

    def __init__(self, collect_ok=True, export_ok=True):
        self.calls: list[str] = []
        self.forms: list[dict] = []
        self.collect_ok = collect_ok
        self.export_ok = export_ok

    def get(self, url: str) -> str:
        self.calls.append(url)
        if "getdata.cgi" in url:
            return self.LOOM_PAGE
        if "exportcsv.cgi" in url:
            return self.EXPORT_PAGE
        if "exportcsv3.cgi" in url:
            return f"<html>{EXPORT_CONFIRMED} em C:\\TMSDATA</html>"
        return "<html>ok</html>"

    def post(self, url: str, form: dict) -> str:
        self.calls.append(url)
        self.forms.append(form)
        if "getdata2" in url:
            return COLLECT_OK if self.collect_ok else "Erro"
        if "exportcsv2" in url:
            return EXPORT_OK if self.export_ok else "Falha"
        return ""


def test_collector_full_flow():
    cgi = FakeCGI()
    c = TmsCollector("http://tms/", cgi.get, cgi.post)
    col, exp = c.run_full()
    assert col.ok and len(col.looms) == 2
    assert exp.ok and exp.confirmed
    # top-2 months per kind, newest-first (O2 semantics)
    assert exp.months["shift"] == ["2024.03", "2024.02", "2024.01"]
    form = cgi.forms[-1]
    assert form["shift[]"] == ["2024.03", "2024.02"]
    assert form["operator[]"] == ["2024.03"]
    assert form["forecast"] == "1"
    # strict endpoint ordering: collect fully precedes export
    order = [u.split("/")[-1] for u in cgi.calls]
    assert order.index("getdata2.cgi") < order.index("exportcsv.cgi")


def test_collector_aborts_export_on_collect_failure():
    cgi = FakeCGI(collect_ok=False)
    c = TmsCollector("http://tms", cgi.get, cgi.post)
    col, exp = c.run_full()
    assert not col.ok and not exp.ok
    assert not any("exportcsv" in u for u in cgi.calls)
    assert "Erro" in col.detail


def test_collect_one_loom():
    """"Tear Específico": only the selected loom is posted, and the
    confirm GET follows success."""
    cgi = FakeCGI()
    c = TmsCollector("http://tms", cgi.get, cgi.post)
    res = c.collect_one("2")
    assert res.ok and res.looms == [("2", "Tear 02")]
    assert cgi.forms[-1]["loom"] == ["2"]
    assert any("getdata3.cgi" in u for u in cgi.calls)


def test_collect_one_unknown_loom_aborts_before_post():
    cgi = FakeCGI()
    c = TmsCollector("http://tms", cgi.get, cgi.post)
    res = c.collect_one("99")
    assert not res.ok and "99" in res.detail
    assert not any("getdata2" in u for u in cgi.calls)  # no POST fired


def test_collect_one_failure_branch():
    cgi = FakeCGI(collect_ok=False)
    c = TmsCollector("http://tms", cgi.get, cgi.post)
    res = c.collect_one("1")
    assert not res.ok and "Erro" in res.detail
    assert not any("getdata3" in u for u in cgi.calls)  # no confirm


def _mk_fact(spark, tmp_path):
    lake = tmp_path / "lake" / "2024-01" / "daily"
    lake.mkdir(parents=True)
    rows = [
        _row("2024-01-05.A", "00001", ef="80", func="400", par="40"),
        _row("2024-01-05.B", "00001", ef="90", func="200", par="240"),
        _row("2024-01-05.C", "00002", ef="0", func="0", par="440"),  # desligado
    ]
    (lake / "d.csv").write_text("\n".join(rows), encoding="utf-8")
    target = str(tmp_path / "fact")
    import_daily(spark, str(tmp_path / "lake"), target)
    return spark.read.parquet(target)


def test_domain_reports(spark, tmp_path):
    fact = _mk_fact(spark, tmp_path)

    eff = efficiency_by_loom_month(fact).where(F.col("Tear") == "00001").collect()[0]
    # weighted: (80*400 + 90*200) / 600 = 83.333...
    assert abs(eff["eficiencia_ponderada"] - (80 * 400 + 90 * 200) / 600) < 1e-9

    off = powered_off_report(fact).collect()
    assert len(off) == 1 and off[0]["Tear"] == "00002"

    pareto = stop_reason_pareto(fact).orderBy("rank").collect()
    assert pareto[0]["rank"] == 1
    assert abs(sum(r["share"] for r in pareto if r["share"] is not None) - 1.0) < 1e-9 \
        or all(r["min_total"] == 0 for r in pareto)

    deltas = {
        (r["Tear"], r["DataTurno"]): r["delta"]
        for r in shift_over_shift_delta(fact).collect()
    }
    assert deltas[("00001", "2024-01-05.B")] == 10.0
    assert deltas[("00001", "2024-01-05.A")] is None

    create_views(fact)
    assert spark.sql("SELECT COUNT(*) n FROM dados_teares").collect()[0]["n"] == 3
    assert (
        spark.sql("SELECT Tear FROM teares_desligados").collect()[0]["Tear"] == "00002"
    )


def test_driver_priority_window_intact():
    """The driver records the FIRST ~50 entries of queries(); since
    round 6 the window is DERIVED from the CORRECTNESS history (policy
    pinned round-robust in tests/test_driver_window.py). Here: the
    window is exactly 50 real names and is the registry prefix."""
    from tms_etl_spark import catalog

    catalog.load_all()
    from tms_etl_spark.catalog import _DRIVER_PRIORITY, QUERIES

    assert len(_DRIVER_PRIORITY) == 50
    assert all(n in QUERIES for n in _DRIVER_PRIORITY)
    assert list(QUERIES)[:50] == _DRIVER_PRIORITY
