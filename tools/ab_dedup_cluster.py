"""Interleaved A/B: dedup_cluster all-docs path (labels over ALL docs
per round) vs edge-subgraph path (labels over nodes in the LSH pair
graph only; singletons attached once at the end).  Both paths are the
REAL operator — the A/B flips the module's DEDUP_SUBGRAPH_MIN_DOCS
dispatch constant, so what is timed is exactly what ships.

Pins value equality first with a DISTRIBUTED comparison (full-outer
join + mismatch count; the r14 sf10 attempt that collected 2 x 500k
label rows to the driver flaked on TaskResultLost).

    python tools/ab_dedup_cluster.py [sf_dir] [n_trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import icechunk_spark.operators.dedup as dd
    from icechunk_spark.engine import get_spark

    spark = get_spark("ab-dedup-cluster")
    spark.sparkContext.setLogLevel("ERROR")

    def run_path(threshold: int):
        dd.DEDUP_SUBGRAPH_MIN_DOCS = threshold
        return dd.dedup_cluster(spark, sf_dir)

    # equality pin first — distributed, no label collect
    a = run_path(1 << 60).withColumnRenamed("cluster_id", "ca")
    b = run_path(0).withColumnRenamed("cluster_id", "cb")
    cmp = a.join(b, "doc_id", "full_outer")
    n_total, n_bad = cmp.agg(
        F.count(F.lit(1)),
        F.sum((~F.col("ca").eqNullSafe(F.col("cb"))).cast("int")),
    ).collect()[0]
    assert n_bad == 0, f"paths disagree on {n_bad} of {n_total} docs!"
    spark.catalog.clearCache()
    print(f"equality pin OK ({n_total} rows, 0 mismatches)", file=sys.stderr)

    res = {"A_alldocs": [], "B_subgraph": []}
    for t in range(n):
        for key, thr in (("A_alldocs", 1 << 60), ("B_subgraph", 0)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run_path(thr).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            res[key].append(round(dt, 3))
            print(f"trial {t + 1}: {key} {dt:.3f}s", file=sys.stderr)
    for k, v in res.items():
        print(f"{k}: min={min(v)} runs={v}")
    spark.stop()


if __name__ == "__main__":
    main()
