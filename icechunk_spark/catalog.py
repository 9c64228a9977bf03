"""Load the driver-generated TPC-H-ish parquet tables as DataFrames.

Parquet scans here are the leaves of every analytic plan: column
pruning and predicate pushdown must reach these scans (verified in
tests via .explain containing PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_parquet_files(sf_dir: str, name: str) -> list[str]:
    """The table's parquet files for driver-side FOOTER reads (single
    file or a flat directory of part files — the only layouts the
    testdata and scale-up writers produce).  Shared by every
    footer-metadata fast path (quantile domain, row counts) so a
    layout change has one place to fix."""
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    return [path]


# (session id, sf_dir) -> table handles.  Building the 10 DataFrames
# costs ~0.8s of driver-side parquet footer reads; without the cache
# EVERY query pays it, while the DuckDB oracle/baseline registers its
# views once.  Handles are lazy immutable plans over table dirs that
# are never mutated in place (testdata + generated scale-ups), so
# reuse is safe; clear_table_cache() exists for anything exotic.
_TABLE_CACHE: dict[tuple[str, int, str], dict[str, DataFrame]] = {}


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    # events.ts is parquet TIMESTAMP(NANOS): Spark only reads it with
    # nanosAsLong=true (→ raw int64 nanoseconds). Convert back to a naive
    # timestamp; session TZ pinned to UTC so the LTZ→NTZ cast is exact.
    # Set at runtime so it also applies under the driver's own session.
    sc = spark.sparkContext
    # applicationId + startTime is stable for the context's lifetime and
    # never reused after stop() (ADVICE r7: CPython can hand a NEW
    # context the same id() as a dead one, resurrecting stale handles)
    key = (sc.applicationId, sc.startTime, os.path.normpath(sf_dir))
    # re-assert the session confs even on cache hits: a caller that
    # mutated the session timeZone between calls would otherwise get a
    # different LTZ->NTZ cast on events.ts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return dict(cached)
    out = {name: spark.read.parquet(table_path(sf_dir, name)) for name in TABLES}
    ts_type = dict(out["events"].dtypes).get("ts")
    if ts_type == "bigint":
        out["events"] = out["events"].withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"),
        )
    _TABLE_CACHE[key] = dict(out)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view so spark.sql() can reference it."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
