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
