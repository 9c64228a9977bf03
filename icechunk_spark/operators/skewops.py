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
- ``skew_salted_join``: revenue by order-priority through a salted
  orders ⋈ lineitem-sums join where the (replicated) small side is
  the per-order lineitem revenue aggregate.  Oracle is the plain
  join+aggregate — again, salt must not change a value.
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
    li_rev = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("rev_cents")
        )
    )
    orders = t["orders"].select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        orders,
        li_rev,
        F.col("o_orderkey") == F.col("l_orderkey"),
        n_salts=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("rev_cents").cast("bigint").alias("rev_cents"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_SALTED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(rev_cents) AS BIGINT) AS rev_cents
FROM orders
JOIN (SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_orderkey) li
  ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}
ORACLES = {
    "skew_salted_agg": SKEW_SALTED_AGG_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_SQL,
}
