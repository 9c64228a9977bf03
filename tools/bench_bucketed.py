"""Measure the bucketed (co-located) fact join against the raw-parquet
plans for q3/q5/q9 — the storage-level answer to the sf10 negative
result (BASELINE.md round-8: the lineitem ⋈ orders exchange is the
structural cost; no session knob removes it from raw parquet).

Usage:
    python tools/bench_bucketed.py [sf_dir]    # default /tmp/sf10_synth

Protocol: one-time bucketize write timed separately (it is the
amortized cost — paid once, saved on every subsequent query); each
query min-of-5 in one warm session (this box shows ±3x variance on
2-8s jobs, PLANS.md round-8).  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_synth"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from icechunk_spark.engine import get_spark
    from icechunk_spark.functions.bucketing import bucketed_db
    from icechunk_spark.operators import bucketed, tpch

    spark = get_spark("icechunk-spark-bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    bucketed_db(spark, sf_dir)
    bucketize_sec = round(time.perf_counter() - t0, 3)

    pairs = {
        "q3": (tpch.q3_shipping_priority, bucketed.q3_bucketed),
        "q5": (tpch.q5_local_supplier, bucketed.q5_bucketed),
        "q9": (tpch.q9_product_profit, bucketed.q9_bucketed),
    }
    raw: dict[str, float] = {}
    buck: dict[str, float] = {}
    for name, (raw_fn, buck_fn) in pairs.items():
        for label, fn, acc in (("raw", raw_fn, raw), ("bucketed", buck_fn, buck)):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            acc[name] = round(best, 3)
            print(f"{name} {label}: {acc[name]}s", file=sys.stderr)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "bucketed_join_vs_raw",
                "unit": "sec",
                "sf_dir": sf_dir,
                "bucketize_write_sec": bucketize_sec,
                "raw": raw,
                "bucketed": buck,
                "speedup": {
                    k: round(raw[k] / buck[k], 2) if buck[k] else None for k in raw
                },
            }
        )
    )


if __name__ == "__main__":
    main()
