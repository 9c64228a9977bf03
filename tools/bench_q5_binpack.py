"""q5_partitioned bin-pack flip probe (VERDICT r13 #4).

BASELINE.md's standing explanation for q5_partitioned's 4x-at-sf10:
the year-partitioned layout writes one file per (year dir, bucket) —
7 years x 32 buckets = 224 lineitem files of ~10 MB where the
unpartitioned bucketed layout has 32 files of ~72 MB — and q5 never
prunes lineitem, so the query pays 7x the footer/task overhead on its
big side.  The claimed flip: at 100 TB each (year, bucket) file sits
in the 64-512 MB comfort band anyway, so the overhead amortizes and
the layout keeps the pruning win for free.

This probe tests the claim AT sf10 by bin-packing the same rows into
band-sized files the only way bucketing allows: fewer buckets per
partition (suggest_buckets applied to per-partition bytes — the rule
functions/bucketing.py documents).  Layouts: buckets in {32, 8, 4}
giving ~10/40/80 MB per (year, bucket) lineitem file.  If the q5 time
falls toward q5_bucketed as file size enters the band, the file-count
explanation is pinned with data; the residual gap (4 buckets = 4-task
join stages on a 32-core box) is the box artifact a 2^18-bucket
100 TB layout does not have.

Usage:
    python tools/bench_q5_binpack.py [sf_dir]   # default /tmp/sf10_synth

Protocol: all layouts built first (writes untimed), then min-of-5
per variant STRICTLY INTERLEAVED with DuckDB q5 in one session; fresh
DataFrame object per run (plan-instance shuffle reuse otherwise fakes
sub-second re-reads).  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET_VARIANTS = [32, 8, 4]


def _table_files(spark, db: str, table: str) -> tuple[int, float, float]:
    """(n_files, median_mb, total_mb) for a saved table's parquet."""
    loc = (
        spark.sql(f"DESC FORMATTED {db}.{table}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    sizes = []
    for root, _dirs, files in os.walk(path):
        sizes += [
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        ]
    mb = 1024 * 1024
    return len(sizes), round(statistics.median(sizes) / mb, 1), round(sum(sizes) / mb, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_synth"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    import duckdb
    from pyspark.sql import functions as F

    from icechunk_spark.engine import get_spark
    from icechunk_spark.functions.bucketing import partitioned_bucketed_db
    from icechunk_spark.operators.bucketed import _q5_cust_side, _q5_shape, q5_bucketed
    from icechunk_spark.operators.tpch import Q5_SQL

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in "region nation customer supplier orders lineitem".split():
        p = f"{sf_dir}/{t}.parquet"
        glob = p + "/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    spark = get_spark("icechunk-spark-bench-q5binpack")
    spark.sparkContext.setLogLevel("ERROR")

    dbs: dict[int, str] = {}
    files: dict[str, dict] = {}
    for b in BUCKET_VARIANTS:
        t0 = time.perf_counter()
        dbs[b] = partitioned_bucketed_db(spark, sf_dir, buckets=b)
        build = round(time.perf_counter() - t0, 1)
        n, med, tot = _table_files(spark, dbs[b], "lineitem")
        files[f"part{b}"] = {
            "lineitem_files": n,
            "lineitem_median_mb": med,
            "lineitem_total_mb": tot,
            "build_sec": build,
        }
        print(f"layout buckets={b}: {n} files, median {med} MB", file=sys.stderr)

    def q5_over(b: int):
        db = dbs[b]
        orders = spark.table(f"{db}.orders").filter(
            (F.col("o_year") == F.lit(1996))
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        return _q5_shape(
            spark, sf_dir, spark.table(f"{db}.lineitem"), orders, _q5_cust_side(spark, sf_dir)
        )

    variants: dict[str, object] = {f"part{b}": (lambda b=b: q5_over(b)) for b in BUCKET_VARIANTS}
    variants["bucketed32"] = lambda: q5_bucketed(spark, sf_dir)

    duck = 9e9
    best: dict[str, float] = {}
    for i in range(5):
        t0 = time.perf_counter()
        con.sql(Q5_SQL).fetchall()
        duck = min(duck, time.perf_counter() - t0)
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            best[name] = min(best.get(name, 9e9), time.perf_counter() - t0)
        print(
            f"pass {i}: duck={duck:.2f} " + " ".join(f"{k}={v:.2f}" for k, v in best.items()),
            file=sys.stderr,
        )
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "q5_partitioned_binpack_flip",
                "unit": "sec",
                "sf_dir": sf_dir,
                "protocol": "min-of-5 interleaved with DuckDB; fresh frame per run",
                "duckdb_q5": round(duck, 3),
                "spark": {k: round(v, 3) for k, v in best.items()},
                "vs_duckdb": {k: round(v / duck, 2) for k, v in best.items()},
                "layout_files": files,
            }
        )
    )


if __name__ == "__main__":
    main()
