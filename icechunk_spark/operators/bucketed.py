"""Co-located (bucketed) variants of the shuffle-bound TPC-H spine
(SURVEY.md §2b extension).

q3_bucketed computes exactly q3_shipping_priority's result (same
oracle SQL) but reads lineitem/orders from the bucketed tables
written by functions.bucketing.bucketed_db: the lineitem ⋈ orders
join is bucket-aligned so Catalyst elides both exchanges and both
sorts, and the (l_orderkey, o_orderdate) aggregation reuses the same
partitioning — zero fact-table shuffles end to end (the customer
semi-filter joins AFTER the co-located join; its small filtered side
broadcasts).  This is the storage-level answer to the sf10 negative
result on q3/q5/q9 (BASELINE.md round-8): the shuffle is paid once
at write time, not on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_sum
from icechunk_spark.functions.bucketing import bucketed_db
from icechunk_spark.operators.tpch import Q3_SQL


def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 over bucketed fact tables: co-located join first, then the
    BUILDING customer semi-filter on the (much smaller) join output."""
    db = bucketed_db(spark, sf_dir)
    li = spark.table(f"{db}.lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    orders = spark.table(f"{db}.orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    cust = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


QUERIES = {
    "q3_bucketed": q3_bucketed,
}

ORACLES = {
    "q3_bucketed": Q3_SQL,
}
