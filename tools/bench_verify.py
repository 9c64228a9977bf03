"""Self-policing headline protocol (VERDICT r10 #8): run the DRIVER's
exact benchmark (``python bench.py`` in a fresh process, default env)
N times and report the BAND — min / median / max of the total and of
every per-query timing — so BASELINE.md records a band, never a
single favorable sample.

    python tools/bench_verify.py [N]        # default 3 runs

Prints one JSON line:
  {"runs": N, "total": {"min":..,"median":..,"max":..},
   "queries": {name: {"min":..,"median":..,"max":..}, ...},
   "totals": [..each run..]}
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run() -> dict:
    """Exactly what the driver does: a fresh ``python bench.py``."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench.py produced no JSON line:\n{out.stderr[-2000:]}")


def band(vals: list[float]) -> dict:
    return {
        "min": round(min(vals), 3),
        "median": round(statistics.median(vals), 3),
        "max": round(max(vals), 3),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = []
    for i in range(n):
        r = one_run()
        runs.append(r)
        print(
            f"run {i + 1}/{n}: total={r['value']}s",
            file=sys.stderr,
        )
    names = sorted({q for r in runs for q in r["queries"]})
    print(
        json.dumps(
            {
                "runs": n,
                "sf": runs[0].get("sf"),
                "total": band([r["value"] for r in runs]),
                "totals": [r["value"] for r in runs],
                "queries": {
                    q: band([r["queries"][q] for r in runs if q in r["queries"]])
                    for q in names
                },
                # per-run load evidence (r14): steal growth / inflated
                # floor probes mark a contaminated run on its face
                "env": [r.get("env") for r in runs],
            }
        )
    )


if __name__ == "__main__":
    main()
