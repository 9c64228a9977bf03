"""Mergeable HyperLogLog distinct counting (SURVEY.md §2b extension):
the sketch-persistence pattern a 100 TB pipeline uses for distinct
metrics — build ONE HLL sketch per (event_type, day) partition, then
answer "distinct users over any day range" by UNIONING sketches
without ever rescanning events (Spark's Datasketches-backed
hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

``distinct_count_approx`` (windows.py) already covers one-shot
approx_count_distinct; what THIS operator adds is the mergeability
contract: the estimate comes from a union of per-day sketches (the
re-aggregation path), not from a direct pass over the raw rows.

Oracle contract (sketch bytes are engine artifacts): the per-type
EXACT distinct count — computed independently by both engines — is
the value-checked column, and the sketch-union estimate must land
within HLL_TOL_PCT of it (lgConfigK=12 gives ~1.6% standard error;
the 5% gate is ~3 sigma).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

HLL_TOL_PCT = 5  # estimate must be within 5% of exact


def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    # stage 1: one bounded sketch per (event_type, day) — at 100 TB
    # these persist alongside the partition and are never rebuilt
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # stage 2: answer the per-type question from the sketches alone
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.col("n_days").cast("bigint").alias("n_days"),
            (
                F.abs(F.col("est") - F.col("exact_distinct")) * 100
                <= F.col("exact_distinct") * HLL_TOL_PCT
            ).alias("estimate_within_tol"),
        )
        .orderBy("event_type")
    )


HLL_MERGEABLE_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       TRUE AS estimate_within_tol
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "hll_mergeable_distinct": hll_mergeable_distinct,
}

ORACLES = {
    "hll_mergeable_distinct": HLL_MERGEABLE_SQL,
}
