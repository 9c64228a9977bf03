"""Skew-mitigation as registered oracle queries (SURVEY.md §2b
extension): functions/skew.py's salted shapes promoted from tested
helpers to value-checked rows, so the 100 TB skew answer carries the
same hard correctness signal as every other operator.

- ``skew_salted_agg``: two-phase (key, salt)->key aggregation over
  events by event_type — a 5-key groupBy is the canonical hot-key
  shape (at 100 TB one event type can be most of the stream; a plain
  groupBy lands it on ONE reducer).  Values in integer cents so both
  engines agree bit-for-bit; the oracle is the PLAIN single-phase SQL
  aggregate — salting must be value-invisible.
- ``skew_salted_join``: revenue by supplier nation through a salted
  lineitem ⋈ supplier join — the big fact side salted, the mid-size
  dimension replicated once per salt (the helper's documented niche:
  a side above the broadcast threshold but cheap to replicate; the
  first registered shape used the 15M-row per-order revenue aggregate
  as the "small" side, whose 8× replication measured 10.6 s at sf10 —
  replication cost scales with the replicated side, so pick one that
  stays dimension-sized).  Oracle is the plain join+aggregate — salt
  must not change a value.  NOTE the honest trade, measured at sf10:
  on UNSKEWED data the salted join is strictly worse than the plain
  plan (2.8 s vs ~1 s broadcast: salting forces the 60M-row shuffle a
  broadcast avoids) — the op is registered for the value contract and
  the mechanism; production gates it on observed hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions.skew import salted_agg, salted_join

N_SALTS = 16


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    return (
        salted_agg(
            ev,
            ["event_type"],
            {
                "n_events": ("count", "c"),
                "sum_cents": ("sum", "c"),
                "min_cents": ("min", "c"),
                "max_cents": ("max", "c"),
            },
            n_salts=N_SALTS,
        )
        .select(
            "event_type",
            "n_events",
            F.col("sum_cents").cast("bigint").alias("sum_cents"),
            "min_cents",
            "max_cents",
        )
        .orderBy("event_type")
    )


SKEW_SALTED_AGG_SQL = """
SELECT event_type,
       CAST(count(c) AS BIGINT) AS n_events,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       min(c) AS min_cents,
       max(c) AS max_cents
FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_suppkey", F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("rc")
    )
    # SHUFFLE_HASH build on the replicated dim: the salted join's big
    # side is already hash-distributed on (key, salt) — a sort-merge
    # would re-sort 60M rows for nothing (measured 4.65 s vs 2.76 s
    # interleaved at sf10, identical values)
    supp = t["supplier"].select("s_suppkey", "s_nationkey").hint("shuffle_hash")
    joined = salted_join(
        li,
        supp,
        F.col("l_suppkey") == F.col("s_suppkey"),
        n_salts=8,
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("rc").cast("bigint").alias("rev_cents"),
        )
        .orderBy("s_nationkey")
    )


SKEW_SALTED_JOIN_SQL = """
SELECT s_nationkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""

QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}
ORACLES = {
    "skew_salted_agg": SKEW_SALTED_AGG_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_SQL,
}
