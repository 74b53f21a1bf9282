"""Collection/export orchestration (SURVEY.md §3 entry points 1-3).

The reference drives a Perl-CGI TMS over HTTP: trigger on-device
collection (`loom/getdata.cgi` → `getdata2.cgi` → `getdata3.cgi`,
/root/reference/src/main_01.py:101-130), then the CSV export CGI
(`edit/exportcsv.cgi` month discovery → `exportcsv2.cgi` POST →
`exportcsv3.cgi` confirm, /root/reference/src/main_02.py:194-390),
with success detected by response substrings.

This module keeps the same endpoint contract and success markers
behind an injectable transport (``get``/``post`` callables), so the
whole flow is testable against a fake CGI and swappable for any
HTTP client in deployment. Everything downstream of the filesystem
hand-off (the CGI writes CSVs into the lake) is the Spark pipeline
(`tms.pipeline.import_daily`).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from tms_etl_spark.sources.adapters import parse_select_options

# Success markers, verbatim from the reference.
COLLECT_OK = "Completado Normalmente"  # /root/reference/src/main_01.py:122
EXPORT_OK = "EXPORT DONE"  # /root/reference/src/main_01.py:162
EXPORT_CONFIRMED = "Exportacao Concluida"  # /root/reference/src/tms_exporter.py:176

Get = Callable[[str], str]
Post = Callable[[str, dict], str]


@dataclass
class CollectResult:
    looms: list[tuple[str, str]]
    ok: bool
    detail: str = ""


@dataclass
class ExportResult:
    months: dict[str, list[str]] = field(default_factory=dict)
    requested: list[str] = field(default_factory=list)
    ok: bool = False
    confirmed: bool = False


class TmsCollector:
    """The reference's collect→export protocol over an injected
    transport. ``base`` is the TMS root (e.g. http://host/tms)."""

    def __init__(self, base: str, get: Get, post: Post) -> None:
        self.base = base.rstrip("/")
        self.get = get
        self.post = post

    # -- entry point 1 stage 2: collection ---------------------------------
    def collect(self) -> CollectResult:
        page = self.get(f"{self.base}/loom/getdata.cgi")
        looms = parse_select_options(page, "loom")
        body = self.post(
            f"{self.base}/loom/getdata2.cgi",
            {"loom": [v for v, _ in looms], "action": "collect"},
        )
        ok = COLLECT_OK in body
        if ok:
            self.get(f"{self.base}/loom/getdata3.cgi")
        return CollectResult(looms=looms, ok=ok, detail="" if ok else body[:200])

    # -- entry point 1b: single-loom collection ("Tear Específico") --------
    def collect_one(self, loom_id: str) -> CollectResult:
        """Collect ONE selected loom — the reference's "Tear
        Específico" flow for looms that were powered off and need
        re-collection without re-running the whole fleet
        (/root/reference/src/main_01.py:1349-1371 dialog →
        stepbystep.md:177-187: "O sistema processa apenas os dados
        desse tear, evitando duplicações").

        Failure branches: a loom id the TMS page doesn't offer aborts
        before any POST; a collect error body reports ``ok=False``
        with the response head, same as :meth:`collect`. Downstream,
        idempotence comes from the keyed MERGE, so re-collecting one
        loom never duplicates rows.
        """
        page = self.get(f"{self.base}/loom/getdata.cgi")
        looms = parse_select_options(page, "loom")
        match = [(v, label) for v, label in looms if v == loom_id]
        if not match:
            return CollectResult(
                looms=[], ok=False, detail=f"loom {loom_id!r} not offered by TMS"
            )
        body = self.post(
            f"{self.base}/loom/getdata2.cgi",
            {"loom": [loom_id], "action": "collect"},
        )
        ok = COLLECT_OK in body
        if ok:
            self.get(f"{self.base}/loom/getdata3.cgi")
        return CollectResult(looms=match, ok=ok, detail="" if ok else body[:200])

    # -- entry point 3: export of the last two months ----------------------
    def export_last_two_months(self) -> ExportResult:
        page = self.get(f"{self.base}/edit/exportcsv.cgi")
        res = ExportResult()
        for kind in ("shift", "operator", "history"):
            res.months[kind] = [v for v, _ in parse_select_options(page, kind)]
        # months arrive newest-first from the TMS; take 2 per kind (O2)
        form: dict = {"forecast": "1"}
        for kind, months in res.months.items():
            form[f"{kind}[]"] = months[:2]
            res.requested += months[:2]
        body = self.post(f"{self.base}/edit/exportcsv2.cgi", form)
        res.ok = EXPORT_OK in body
        if res.ok:
            confirm = self.get(f"{self.base}/edit/exportcsv3.cgi")
            res.confirmed = EXPORT_CONFIRMED in confirm
        return res

    # -- entry point 1: the full pipeline dispatch -------------------------
    def run_full(self) -> tuple[CollectResult, ExportResult]:
        """Collect then export (the reference's strict ordering,
        /root/reference/src/main_03.py:514-550). The subsequent
        import stage is `tms.pipeline.import_daily` over the lake
        the CGI wrote into."""
        c = self.collect()
        if not c.ok:
            return c, ExportResult()
        return c, self.export_last_two_months()
