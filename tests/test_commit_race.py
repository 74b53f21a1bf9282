"""Multiprocess two-writer commit race (VERDICT r5 item 6): the
conditional-commit protocol (`fs.createNewFile` O_EXCL lock +
exists-check, `operators/versioned.py:_write_json_atomic`) arbitrated
in-process before; this drives it under REAL contention — two OS
processes, two JVMs, one table.

Phase 1 is deterministic by construction: both processes rendezvous
at a file barrier and then try to commit THE SAME version number.
Whatever the interleaving, exactly one wins — an overlapping loser
fails at the O_EXCL lock, a late loser at the exists-check — so the
test asserts one WIN + one LOSE every run, not just "no corruption
observed". Phase 2 is a contended append loop with retries, pinning
that the retry protocol converges and the manifest chain stays
consistent."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys, time

sys.path.insert(0, {repo!r})
tag, other, tdir, tdir2, bdir = sys.argv[1:6]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-{{tag}}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from pyspark.sql import functions as F

from tms_etl_spark.operators.versioned import (
    ConcurrentWriteError,
    _manifest_path,
    _write_json_atomic,
    write_version,
)

# ---- phase 1: both race the SAME version number --------------------
open(os.path.join(bdir, f"ready-{{tag}}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(bdir, f"ready-{{other}}")):
    if time.time() > deadline:
        print("RESULT barrier-timeout", flush=True)
        sys.exit(2)
    time.sleep(0.005)

payload = {{"version": 1, "dirs": [], "op": "append", "stats": {{}},
            "recent_txns": [], "winner": tag}}
try:
    _write_json_atomic(spark, _manifest_path(tdir, 1), payload)
    print(f"RESULT {{tag}} WIN", flush=True)
except ConcurrentWriteError:
    print(f"RESULT {{tag}} LOSE", flush=True)

# ---- phase 2: contended appends with the documented retry loop -----
ids = {{"a": 0, "b": 1000}}[tag]
for i in range(3):
    df = spark.range(ids + i * 10, ids + i * 10 + 10).select(
        F.col("id"), F.lit(tag).alias("writer")
    )
    for attempt in range(60):
        try:
            write_version(df, tdir2, "append")
            break
        except ConcurrentWriteError:
            time.sleep(0.01 * (attempt % 5))
    else:
        print("RESULT append-gaveup", flush=True)
        sys.exit(3)
print(f"RESULT {{tag}} APPENDS-DONE", flush=True)
spark.stop()
"""


def test_two_process_commit_race(tmp_path, spark):
    tdir = str(tmp_path / "race_same_version")
    tdir2 = str(tmp_path / "race_appends")
    bdir = str(tmp_path / "barrier")
    os.makedirs(bdir)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))

    env = dict(os.environ)
    procs = {
        tag: subprocess.Popen(
            [sys.executable, str(script), tag, other, tdir, tdir2, bdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for tag, other in (("a", "b"), ("b", "a"))
    }
    out = {}
    for tag, p in procs.items():
        stdout, stderr = p.communicate(timeout=300)
        out[tag] = stdout
        assert p.returncode == 0, f"{tag} failed:\n{stdout}\n{stderr[-2000:]}"

    # phase 1: EXACTLY one winner, and the surviving manifest is the
    # winner's payload — the loser's bytes never landed
    results = (out["a"] + out["b"]).splitlines()
    wins = [ln for ln in results if ln.endswith("WIN")]
    loses = [ln for ln in results if ln.endswith("LOSE")]
    assert len(wins) == 1 and len(loses) == 1, results
    winner_tag = wins[0].split()[1]
    man = json.loads(
        (pathlib.Path(tdir) / "_manifests" / "v000001.json").read_text()
    )
    assert man["winner"] == winner_tag
    # no stale lock left behind
    assert not list((pathlib.Path(tdir) / "_manifests").glob("*.lock"))

    # phase 2: both writers' appends all landed; chain is consistent
    from tms_etl_spark.operators.versioned import (
        current_version,
        read_version,
    )

    assert current_version(spark, tdir2) == 6
    rows = read_version(spark, tdir2).collect()
    assert len(rows) == 60
    by_writer = {}
    for r in rows:
        by_writer.setdefault(r["writer"], set()).add(r["id"])
    assert by_writer["a"] == set(range(0, 30))
    assert by_writer["b"] == set(range(1000, 1030))
    # every manifest in the chain parses and references live dirs
    for v in range(1, 7):
        man = json.loads(
            (pathlib.Path(tdir2) / "_manifests" / f"v{v:06d}.json").read_text()
        )
        assert man["version"] == v
        for d in man["dirs"]:
            assert (pathlib.Path(tdir2) / d).is_dir()


_DML_WORKER = """
import os, sys, time

sys.path.insert(0, {repo!r})
tag, other, tdir, bdir = sys.argv[1:5]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"dmlrace-{{tag}}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from tms_etl_spark.operators.versioned import merge_version, write_version

open(os.path.join(bdir, f"ready-{{tag}}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(bdir, f"ready-{{other}}")):
    if time.time() > deadline:
        print("RESULT barrier-timeout", flush=True)
        sys.exit(2)
    time.sleep(0.005)

# contended disjoint-key MERGEs: each process rewrites its own file
# (keys 0..9 live in file A, 50..59 in file B — the zonemap cut keeps
# the candidate sets disjoint), so the conflict check must let the
# race's loser retry and land
lo, val = {{"a": (0, 111), "b": (50, 222)}}[tag]
src = spark.createDataFrame(
    [(lo + i, val) for i in range(10)], "k int, v int"
)
merge_version(spark, tdir, src, "k", commit_retries=40)
print(f"RESULT {{tag}} MERGE-DONE", flush=True)

# merge-vs-append contention: a key-disjoint append racing whatever
# the other process is committing
base = {{"a": 1000, "b": 2000}}[tag]
app = spark.createDataFrame(
    [(base + i, -1) for i in range(5)], "k int, v int"
)
write_version(app.coalesce(1), tdir, "append", commit_retries=40)
print(f"RESULT {{tag}} APPEND-DONE", flush=True)
spark.stop()
"""


def test_two_process_dml_race_disjoint_lands(tmp_path, spark):
    """VERDICT r11 #1 'Done' clause: a MERGE and a disjoint-key MERGE
    (and MERGE vs append) both land under REAL two-process
    contention with ``commit_retries``, and the table equals serial
    application. The deterministic conflicting-pair refusals live in
    test_round12_props.py (injected race, named errors)."""
    from pyspark.sql import functions as F

    from tms_etl_spark.operators.versioned import (
        current_version,
        read_version,
        write_version,
    )

    tdir = str(tmp_path / "dml_race")
    bdir = str(tmp_path / "barrier")
    os.makedirs(bdir)
    # two files with disjoint key ranges, so the two merges' touched
    # sets are provably disjoint under the zonemap cut
    write_version(
        spark.range(0, 50)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).cast("int").alias("v"),
        )
        .coalesce(1),
        tdir,
        "append",
    )
    write_version(
        spark.range(50, 100)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).cast("int").alias("v"),
        )
        .coalesce(1),
        tdir,
        "append",
    )
    script = tmp_path / "dml_worker.py"
    script.write_text(_DML_WORKER.format(repo=REPO))
    procs = {
        tag: subprocess.Popen(
            [sys.executable, str(script), tag, other, tdir, bdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=dict(os.environ),
        )
        for tag, other in (("a", "b"), ("b", "a"))
    }
    for tag, p in procs.items():
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"{tag} failed:\n{stdout}\n{stderr[-2000:]}"
        assert f"{tag} MERGE-DONE" in stdout and f"{tag} APPEND-DONE" in stdout

    # table equals SERIAL application of all four ops, whatever the
    # interleaving was
    got = {r["k"]: r["v"] for r in read_version(spark, tdir).collect()}
    expect = {k: k * 10 for k in range(100)}
    expect.update({i: 111 for i in range(10)})
    expect.update({50 + i: 222 for i in range(10)})
    expect.update({1000 + i: -1 for i in range(5)})
    expect.update({2000 + i: -1 for i in range(5)})
    assert got == expect
    # chain: 2 base + 2 merges + 2 appends, gapless and parseable
    assert current_version(spark, tdir) == 6
    for v in range(1, 7):
        man = json.loads(
            (pathlib.Path(tdir) / "_manifests" / f"v{v:06d}.json").read_text()
        )
        assert man["version"] == v


class _FakeObjectStore:
    """In-memory object store exposing ONLY an atomic put-if-absent —
    the minimal contract the seam requires of S3 If-None-Match / GCS
    if-generation-match / Azure If-None-Match bindings."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.objects: dict[str, bytes] = {}
        self.put_attempts = 0

    def put_if_absent(self, path: str, data: bytes) -> bool:
        with self._lock:
            self.put_attempts += 1
            if path in self.objects:
                return False
            self.objects[path] = data
            return True


def test_conditional_put_two_writer_race(spark):
    """Fake-object-store mirror of phase 1: two threads rendezvous at
    a barrier and commit THE SAME manifest path through the
    registered conditional-put seam. Exactly one wins; the surviving
    object is the winner's payload; the loser sees
    ConcurrentWriteError. No lock or tmp object exists in the store
    at any point (the conditional PUT is the entire commit)."""
    import threading

    from tms_etl_spark.operators.versioned import (
        ConcurrentWriteError,
        _write_json_atomic,
        set_conditional_put,
    )

    store = _FakeObjectStore()
    set_conditional_put(store.put_if_absent)
    try:
        path = "fake://bucket/tbl/_manifests/v000001.json"
        barrier = threading.Barrier(2)
        results: dict[str, str] = {}

        def writer(tag: str) -> None:
            barrier.wait(timeout=30)
            try:
                _write_json_atomic(
                    spark, path, {"version": 1, "winner": tag}
                )
                results[tag] = "WIN"
            except ConcurrentWriteError:
                results[tag] = "LOSE"

        ts = [
            threading.Thread(target=writer, args=(t,)) for t in ("a", "b")
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert sorted(results.values()) == ["LOSE", "WIN"]
        winner = next(k for k, v in results.items() if v == "WIN")
        assert json.loads(store.objects[path])["winner"] == winner
        assert set(store.objects) == {path}  # no locks, no tmps
    finally:
        set_conditional_put(None)


def test_conditional_put_contended_retry_convergence(spark):
    """Fake-object-store mirror of phase 2: four writers append-loop
    with the documented retry protocol (re-read current version,
    re-commit at version+1 on ConcurrentWriteError). All commits land,
    versions are gapless, every writer's payloads survive verbatim."""
    import threading

    from tms_etl_spark.operators.versioned import (
        ConcurrentWriteError,
        _write_json_atomic,
        set_conditional_put,
    )

    store = _FakeObjectStore()
    set_conditional_put(store.put_if_absent)
    try:
        base = "fake://bucket/tbl2/_manifests"
        n_writers, n_commits = 4, 5

        def current() -> int:
            vs = [
                int(p.rsplit("/v", 1)[1][:6])
                for p in store.objects
                if p.startswith(base)
            ]
            return max(vs, default=0)

        def writer(tag: int) -> None:
            for i in range(n_commits):
                for _ in range(200):
                    v = current() + 1
                    try:
                        _write_json_atomic(
                            spark,
                            f"{base}/v{v:06d}.json",
                            {"version": v, "writer": tag, "i": i},
                        )
                        break
                    except ConcurrentWriteError:
                        continue
                else:
                    raise AssertionError(f"writer {tag} gave up")

        ts = [
            threading.Thread(target=writer, args=(t,))
            for t in range(n_writers)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        total = n_writers * n_commits
        assert len(store.objects) == total
        mans = [json.loads(b) for b in store.objects.values()]
        assert sorted(m["version"] for m in mans) == list(
            range(1, total + 1)
        )  # gapless chain
        per = {}
        for m in mans:
            per.setdefault(m["writer"], set()).add(m["i"])
        assert all(per[t] == set(range(n_commits)) for t in range(n_writers))
        assert store.put_attempts >= total  # contention actually happened
    finally:
        set_conditional_put(None)
