"""Ingestion adapters (SURVEY.md §2.1 S5-S7): the reference's
HTML/CGI scraping surface re-expressed as pure parsing functions +
small-dimension DataFrame builders.

The reference drives a Perl-CGI app: scrape ``<select name=loom>``
options for the loom registry (/root/reference/src/main_01.py:48-72),
three month ``<select>`` lists for export discovery
(/root/reference/src/main_02.py:144-192), and ``--->`` status lines
from the collection log (/root/reference/src/tms_colector.py:252-286).
Network I/O stays outside the engine (injectable fetch callable);
parsing is stdlib-only (html.parser) so it is testable offline and
has no scraping dependency.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[str], str]  # url -> body; injected, stubbed in tests


class _SelectParser(HTMLParser):
    """Collect (select_name, option_value, option_text) triples."""

    def __init__(self) -> None:
        super().__init__()
        self.rows: list[tuple[str, str, str]] = []
        self._select: str | None = None
        self._value: str | None = None
        self._text: list[str] = []
        self._in_option = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "select":
            self._select = a.get("name", "")
        elif tag == "option" and self._select is not None:
            self._in_option = True
            self._value = a.get("value", "")
            self._text = []

    def handle_data(self, data):
        if self._in_option:
            self._text.append(data)

    def handle_endtag(self, tag):
        if tag == "option" and self._in_option:
            self.rows.append(
                (self._select or "", self._value or "", "".join(self._text).strip())
            )
            self._in_option = False
        elif tag == "select":
            self._select = None


def parse_select_options(html: str, select_name: str) -> list[tuple[str, str]]:
    """S5/S6: (value, text) pairs of one named ``<select>``."""
    p = _SelectParser()
    p.feed(html)
    return [(v, t) for name, v, t in p.rows if name == select_name]


def looms_dimension(spark: SparkSession, html: str) -> DataFrame:
    """S5: the loom registry as a broadcast-ready dimension —
    (tear, nome, ip). Ids are zero-padded strings; names may embed an
    IP (/root/reference/src/tms_colector.py:302-307)."""
    rows = []
    for value, text in parse_select_options(html, "loom"):
        ip = None
        m = re.search(r"(\d{1,3}(?:\.\d{1,3}){3})", text)
        if m:
            ip = m.group(1)
        rows.append((value.zfill(5), text, ip))
    return spark.createDataFrame(rows, "tear string, nome string, ip string")


def months_dimension(spark: SparkSession, html: str) -> DataFrame:
    """S6: (kind, month) rows from the three export selects
    (shift/operator/history); months are TMS-format ``YYYY.MM``
    (/root/reference/src/tms_exporter.py:31-50)."""
    rows = []
    for kind in ("shift", "operator", "history"):
        for value, _ in parse_select_options(html, kind):
            if re.fullmatch(r"\d{4}\.\d{2}", value):
                rows.append((kind, value))
    return spark.createDataFrame(rows, "kind string, month string")


STATUS_RE = re.compile(r"^(?P<loom>.+?)\s*--->\s*(?P<status>.+)$")
KNOWN_STATUSES = (
    "Com Sucesso",
    "Horario do Tear Incorreto",
    "Desligada",
    "Not Support TMS",
)


def parse_status_lines(log_text: str) -> list[tuple[str, str]]:
    """S7: ``<loom> ---> <status>`` collection-log lines → (loom,
    status) tuples (/root/reference/src/tms_colector.py:209-219)."""
    out = []
    for line in log_text.splitlines():
        m = STATUS_RE.match(line.strip())
        if m:
            out.append((m.group("loom").strip(), m.group("status").strip()))
    return out


def collection_events(spark: SparkSession, log_text: str) -> DataFrame:
    """S7/T7: status lines as the events-shaped frame the streaming
    counters aggregate (maps to the driver's `events` table shape)."""
    return spark.createDataFrame(
        parse_status_lines(log_text), "loom string, status string"
    )
