"""Python Data Source (Spark 4 `pyspark.sql.datasource` API) for the
reference's collection-status logs — the modern front door to the S7
status-line surface:

    spark.dataSource.register(StatusLogDataSource)
    df = (spark.read.format("tms_status")
          .option("path", "/lake/collect_logs").load())

vs the helper-function adapters in `sources/adapters.py` (kept — they
serve the driver-less unit surface). The data source distributes the
PARSING: `partitions()` lists the log files (driver-side metadata
only), and each `read(partition)` parses one file on an executor —
10k log files become 10k parallel parse tasks instead of one driver
loop, which is the whole point at fleet scale.

Reference semantics preserved (tms_colector.py:209-219 status-marker
contract): `<loom> ---> <status>` lines, unknown lines skipped,
latin-1 fallback for the legacy encoding (`source.py:55` discipline).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_STATUS_RE = re.compile(r"^(?P<loom>.+?)\s*--->\s*(?P<status>.+)$")
_EXTS = (".log", ".txt")


@dataclass
class _FilePartition(InputPartition):
    path: str


def _list_log_files(root: str) -> list[str]:
    if os.path.isfile(root):
        return [root]
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.lower().endswith(_EXTS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _read_text(path: str) -> str:
    raw = open(path, "rb").read()
    if raw.startswith(b"\xef\xbb\xbf"):
        raw = raw[3:]
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


class StatusLogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tms_status requires .option('path', ...)")
        self._files = _list_log_files(path)

    def partitions(self) -> list[InputPartition]:
        # one partition per file: listing is driver-side metadata,
        # parsing runs wherever the task lands
        return [_FilePartition(p) for p in self._files] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        for line in _read_text(partition.path).splitlines():
            m = _STATUS_RE.match(line.strip())
            if m:
                yield (
                    m.group("loom").strip(),
                    m.group("status").strip(),
                    partition.path,
                )


class StatusLogDataSource(DataSource):
    """`spark.read.format("tms_status")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tms_status"

    def schema(self) -> str:
        return "loom string, status string, src_file string"

    def reader(self, schema) -> StatusLogReader:
        return StatusLogReader(self.options)

    def simpleStreamReader(self, schema):
        return StatusLogStreamReader(self.options)


class StatusLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: tail the log directory as an append-only file
    stream. The offset is the count of files processed in sorted-name
    order (collector logs are timestamped, so names sort in arrival
    order); `readBetweenOffsets` replays any committed range
    deterministically from the same listing, which is what gives the
    source exactly-once semantics under micro-batch retries."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tms_status requires .option('path', ...)")
        self._path = path

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def _rows(self, files: list[str]):
        for f in files:
            for line in _read_text(f).splitlines():
                m = _STATUS_RE.match(line.strip())
                if m:
                    yield (
                        m.group("loom").strip(),
                        m.group("status").strip(),
                        f,
                    )

    def read(self, start: dict):
        files = _list_log_files(self._path)
        new = files[start["n_files"]:]
        # materialize: the harness pickles the batch to the executors,
        # and generators don't pickle
        return list(self._rows(new)), {"n_files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_log_files(self._path)
        return list(self._rows(files[start["n_files"]:end["n_files"]]))
