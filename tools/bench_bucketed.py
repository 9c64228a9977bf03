"""Measure the bucketed (co-located) fact joins against the raw-parquet
plans AND against DuckDB for q3/q5/q9 — the storage-level answer to the
sf10 negative result (BASELINE.md round-8: the lineitem ⋈ orders
exchange is the structural cost on raw parquet; round-9 added per-join
SHUFFLE_HASH over the co-located buckets, putting all three spines
inside the 2× DuckDB bar).

Usage:
    python tools/bench_bucketed.py [sf_dir]    # default /tmp/sf10_synth

Protocol (round-9): one-time bucketize write timed separately (the
amortized cost — paid once, saved on every subsequent query); then
min-of-7 per query with DuckDB and Spark STRICTLY INTERLEAVED per pass
in one session — this box shows ±3× variance on 2-8 s jobs (PLANS.md
round-8), and interleaving is the only way a cross-engine ratio is
trustworthy.  Raw-parquet Spark rows run min-of-3 inside the same
session.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_synth"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    import duckdb

    from icechunk_spark.engine import get_spark
    from icechunk_spark.functions.bucketing import bucketed_db
    from icechunk_spark.operators import bucketed, tpch
    from icechunk_spark.operators.tpch import Q3_SQL, Q5_SQL, Q9_SQL

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in "region nation customer supplier part orders lineitem".split():
        p = f"{sf_dir}/{t}.parquet"
        glob = p + "/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    spark = get_spark("icechunk-spark-bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    bucketed_db(spark, sf_dir)
    bucketize_sec = round(time.perf_counter() - t0, 3)

    sqls = {"q3": Q3_SQL, "q5": Q5_SQL, "q9": Q9_SQL}
    bfns = {
        "q3": bucketed.q3_bucketed,
        "q5": bucketed.q5_bucketed,
        "q9": bucketed.q9_bucketed,
    }
    rfns = {
        "q3": tpch.q3_shipping_priority,
        "q5": tpch.q5_local_supplier,
        "q9": tpch.q9_product_profit,
    }
    duck: dict[str, float] = {}
    buck: dict[str, float] = {}
    raw: dict[str, float] = {}
    for i in range(7):
        for name in ("q3", "q5", "q9"):
            t0 = time.perf_counter()
            con.sql(sqls[name]).fetchall()
            duck[name] = min(duck.get(name, 9e9), time.perf_counter() - t0)
            t0 = time.perf_counter()
            bfns[name](spark, sf_dir).count()
            buck[name] = min(buck.get(name, 9e9), time.perf_counter() - t0)
            if i < 3:
                t0 = time.perf_counter()
                rfns[name](spark, sf_dir).count()
                raw[name] = min(raw.get(name, 9e9), time.perf_counter() - t0)
        print(
            f"pass {i}: duck={ {k: round(v, 2) for k, v in duck.items()} } "
            f"buck={ {k: round(v, 2) for k, v in buck.items()} }",
            file=sys.stderr,
        )
    spark.stop()
    rnd = lambda d: {k: round(v, 3) for k, v in d.items()}  # noqa: E731
    print(
        json.dumps(
            {
                "metric": "bucketed_vs_duckdb_interleaved",
                "unit": "sec",
                "sf_dir": sf_dir,
                "protocol": "min-of-7 interleaved with DuckDB (raw min-of-3)",
                "bucketize_write_sec": bucketize_sec,
                "duckdb": rnd(duck),
                "raw": rnd(raw),
                "bucketed": rnd(buck),
                "speedup": {k: round(raw[k] / buck[k], 2) for k in raw},
                "vs_duckdb": {k: round(buck[k] / duck[k], 2) for k in buck},
            }
        )
    )


if __name__ == "__main__":
    main()
