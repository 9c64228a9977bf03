"""Headline benchmark: runs the flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Mix: core analytics (q1/q3/q5/q9), LLM-pipeline (dedup_exact,
minhash_lsh, token_count, knn_brute_force), and the versioned store
end-to-end (array_store_roundtrip = encode + commit + pruned read).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "dedup_exact",
    "minhash_lsh",
    "token_count",
    "knn_brute_force",
    "array_store_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from icechunk_spark.engine import get_spark
    from icechunk_spark.registry import all_queries

    spark = get_spark("icechunk-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm the JVM + parquet footers so timings measure the plans
    queries["q6_forecast_revenue"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
