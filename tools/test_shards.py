"""Sharded test runner (VERDICT r10 #9): the suite's wall-clock is
dominated by serialized Spark jobs on one session — split the test
FILES into K balanced shards and run them as K concurrent pytest
processes, each with its own SparkSession sized to 32/K cores.

    python tools/test_shards.py [K]            # default 4 shards

Isolation: each shard runs with its own CWD under /tmp so
spark-warehouse/ (bucketed_db saveAsTable) and any relative scratch
never collide across processes.  Balancing: greedy longest-first by
the per-file durations recorded in tools/test_durations.json
(written back from each run's junitxml, so the balance improves with
use); unknown files fall back to a size heuristic.

Exit code is non-zero if ANY shard fails; each shard's tail is
printed on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "tools", "test_durations.json")


def load_weights() -> dict[str, float]:
    try:
        with open(WEIGHTS) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def test_files() -> list[str]:
    d = os.path.join(REPO, "tests")
    return sorted(
        f for f in os.listdir(d) if f.startswith("test_") and f.endswith(".py")
    )


def balance(files: list[str], k: int, weights: dict[str, float]) -> list[list[str]]:
    def w(f: str) -> float:
        if f in weights:
            return weights[f]
        return os.path.getsize(os.path.join(REPO, "tests", f)) / 1000.0

    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(k)]
    for f in sorted(files, key=w, reverse=True):
        i = min(range(k), key=lambda j: shards[j][0])
        shards[i] = (shards[i][0] + w(f), shards[i][1] + [f])
    return [s[1] for s in shards]


def run_shard(i: int, files: list[str], cpus: int, scratch: str) -> tuple[subprocess.Popen, str, str]:
    cwd = os.path.join(scratch, f"shard{i}")
    os.makedirs(cwd, exist_ok=True)
    xml = os.path.join(scratch, f"shard{i}.xml")
    log = os.path.join(scratch, f"shard{i}.log")
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=REPO)
    cmd = [
        sys.executable,
        "-m",
        "pytest",
        "-q",
        "-p",
        "no:cacheprovider",
        f"--junitxml={xml}",
        *[os.path.join(REPO, "tests", f) for f in files],
    ]
    out = open(log, "w")
    return (
        subprocess.Popen(cmd, cwd=cwd, env=env, stdout=out, stderr=subprocess.STDOUT),
        xml,
        log,
    )


def harvest_durations(xmls: list[str]) -> dict[str, float]:
    per_file: dict[str, float] = {}
    for xml in xmls:
        if not os.path.exists(xml):
            continue
        try:
            root = ET.parse(xml).getroot()
        except ET.ParseError:
            continue
        for case in root.iter("testcase"):
            # classname is the module's dotted import path; with the
            # per-shard /tmp CWD pytest reports it bare ("test_x"),
            # from the repo root it's "tests.test_x" — take the leaf
            cls = case.get("classname", "")
            leaf = cls.split(".")[-1] if cls else ""
            if leaf.startswith("test_"):
                fname = leaf + ".py"
                per_file[fname] = per_file.get(fname, 0.0) + float(case.get("time", 0))
    return per_file


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = max(4, int(os.environ.get("SPARK_GRAFT_CPUS", "32")) // k)
    shards = balance(test_files(), k, load_weights())
    scratch = tempfile.mkdtemp(prefix="icshards_")
    t0 = time.perf_counter()
    procs = [run_shard(i, files, cpus, scratch) for i, files in enumerate(shards)]
    codes = [p.wait() for p, _, _ in procs]
    wall = time.perf_counter() - t0

    per_file = harvest_durations([xml for _, xml, _ in procs])
    if per_file:
        merged = {**load_weights(), **{f: round(v, 1) for f, v in per_file.items()}}
        with open(WEIGHTS, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
            f.write("\n")

    ok = True
    for i, ((_, _, log), code) in enumerate(zip(procs, codes)):
        tail = open(log).read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"shard {i} [{len(shards[i])} files] exit={code}: {summary}")
        if code != 0:
            ok = False
            print("\n".join(tail[-40:]))
    print(f"\nsharded suite wall-clock: {wall:.1f}s across {k} shards x local[{cpus}]")
    if ok:
        shutil.rmtree(scratch, ignore_errors=True)
    else:
        print(f"shard logs kept in {scratch}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
