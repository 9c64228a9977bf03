"""r14 optimization-round full-surface timing sweep (guide §1:
measure first).  Times EVERY registered query at the given sf dir
with the noop sink (computation only, no driver materialization
beyond what the query itself does) and prints one JSON line sorted
by cost, plus a ranked table on stderr.

    python tools/sweep_r14.py [sf_dir] [n_runs] [query ...]

Not part of the driver contract — a measurement instrument for the
optimization round.  bench.py (the official instrument) is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])

    from icechunk_spark.engine import get_spark
    from icechunk_spark.registry import all_queries

    spark = get_spark("icechunk-spark-sweep-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm JVM + parquet footers + Python-worker/Arrow spin-up (the
    # same warmup bench.py does, so per-query numbers are comparable)
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("g", (F.col("id") % 4).cast("int"))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g int").count()
    warm.mapInPandas(lambda it: it, "id long, g int").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    names = [n for n in sorted(queries) if not only or n in only]
    for i, name in enumerate(names):
        best = float("inf")
        try:
            for _ in range(n_runs):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as ex:  # keep sweeping; record the failure
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            f"{timings.get(name, 'ERR')}",
            file=sys.stderr,
        )
    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    for n, s in list(ranked.items())[:30]:
        print(f"{s:8.3f}  {n}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_runs": n_runs,
                "total": round(sum(timings.values()), 3),
                "queries": ranked,
                "errors": errors,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
