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


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    # events.ts is parquet TIMESTAMP(NANOS): Spark only reads it with
    # nanosAsLong=true (→ raw int64 nanoseconds). Convert back to a naive
    # timestamp; session TZ pinned to UTC so the LTZ→NTZ cast is exact.
    # Set at runtime so it also applies under the driver's own session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {name: spark.read.parquet(table_path(sf_dir, name)) for name in TABLES}
    ts_type = dict(out["events"].dtypes).get("ts")
    if ts_type == "bigint":
        out["events"] = out["events"].withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"),
        )
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view so spark.sql() can reference it."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
