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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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



class _VersionedWriteMessage(WriterCommitMessage):
    def __init__(self, rel_file: str | None, n_rows: int) -> None:
        self.rel_file = rel_file
        self.n_rows = n_rows


class VersionedTableWriter(DataSourceWriter):
    """Python Data Source WRITER committing into the engine's
    versioned-table format (`operators/versioned.py`):

        df.write.format("tms_versioned").option("path", DIR)
          .mode("append").save()

    Executor side: each partition streams its rows into ONE parquet
    file of a version-private pending dir via pyarrow — no JVM on the
    write path. Driver side: `commit()` runs only after every task
    succeeded and turns the pending dir into the next version through
    `commit_existing_dir` (zonemap stats + conditional manifest
    rename), so a half-failed write never becomes readable; `abort()`
    leaves only an unreferenced pending dir for `expire_versions`'
    grace-aware GC. Local/POSIX paths (tests, NFS) — object stores
    would swap in pyarrow.fs."""

    def __init__(self, schema, options: dict, overwrite: bool) -> None:
        import uuid

        path = options.get("path")
        if not path:
            raise ValueError("tms_versioned requires .option('path', ...)")
        self._table = path.removeprefix("file:")
        self._schema = schema
        self._mode = "overwrite" if overwrite else "append"
        self._pending = f"data/pending-{uuid.uuid4().hex[:8]}"

    def write(self, rows) -> _VersionedWriteMessage:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        batch = [r.asDict() for r in rows]
        if not batch:
            return _VersionedWriteMessage(None, 0)
        out_dir = os.path.join(self._table, self._pending)
        os.makedirs(out_dir, exist_ok=True)
        rel = f"part-{uuid.uuid4().hex[:12]}.parquet"
        table = pa.Table.from_pylist(
            batch, schema=to_arrow_schema(self._schema)
        )
        pq.write_table(table, os.path.join(out_dir, rel))
        return _VersionedWriteMessage(rel, len(batch))

    def commit(self, messages) -> None:
        n = sum(m.n_rows for m in messages if m is not None)
        if n == 0:
            return  # nothing landed; no version to commit
        _commit_pending_pure_python(self._table, self._pending, self._mode)

    def abort(self, messages) -> None:
        # pending dir stays unreferenced; expire_versions GCs it
        # after the orphan grace window
        pass


class VersionedTableDataSource(DataSource):
    """`df.write.format("tms_versioned")` — see VersionedTableWriter."""

    @classmethod
    def name(cls) -> str:
        return "tms_versioned"

    def writer(self, schema, overwrite: bool) -> VersionedTableWriter:
        return VersionedTableWriter(schema, self.options, overwrite)


def _commit_pending_pure_python(
    table_dir: str, pending_rel: str, mode: str
) -> int:
    """Manifest commit without a JVM: the Data Source writer's
    `commit()` runs in a driver-side Python runner with no
    SparkSession, so this mirrors `operators/versioned.py`'s protocol
    with stdlib + pyarrow — per-file zonemaps come from parquet
    ROW-GROUP METADATA (no data pass at all), the lock is
    os.open(O_CREAT|O_EXCL) and the commit point an os.rename, both
    POSIX-atomic. Manifests are format-identical, so every versioned
    read path (time travel, pruning, CDC tail) works on tables this
    writer produced. Local/POSIX paths only (matching the writer)."""
    import glob
    import json as _json
    import os

    import pyarrow.parquet as pq

    man_dir = os.path.join(table_dir, "_manifests")
    os.makedirs(man_dir, exist_ok=True)
    cur = 0
    for f in os.listdir(man_dir):
        if f.startswith("v") and f.endswith(".json"):
            cur = max(cur, int(f[1:-5]))
    prev = None
    if cur:
        with open(os.path.join(man_dir, f"v{cur:06d}.json")) as fh:
            prev = _json.load(fh)
    v = cur + 1

    stats: dict = {}
    for fp in sorted(
        glob.glob(os.path.join(table_dir, pending_rel, "*.parquet"))
    ):
        meta = pq.ParquetFile(fp).metadata
        entry: dict = {}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                    except UnicodeDecodeError:
                        continue
                if isinstance(mn, float) and (mn != mn or mx != mx):
                    continue
                name = col.path_in_schema
                if name in entry:
                    entry[name] = [min(entry[name][0], mn),
                                   max(entry[name][1], mx)]
                else:
                    entry[name] = [mn, mx]
        rel = f"{pending_rel}/{os.path.basename(fp)}"
        stats[rel] = entry

    dirs = [pending_rel]
    recent = list(prev.get("recent_txns", [])) if prev else []
    if mode == "append" and prev is not None:
        dirs = list(prev["dirs"]) + dirs
        stats = {**prev.get("stats", {}), **stats}
    payload = {
        "version": v,
        "dirs": dirs,
        "op": mode,
        "stats": stats,
        "recent_txns": recent[:64],
    }
    target = os.path.join(man_dir, f"v{v:06d}.json")
    lock = target + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.close(fd)
        if os.path.exists(target):
            raise RuntimeError(f"{target} already committed")
        tmp = f"{target}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            _json.dump(payload, fh)
        os.rename(tmp, target)
    finally:
        os.unlink(lock)
    return v
