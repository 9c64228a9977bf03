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

from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_sum
from icechunk_spark.functions.bucketing import (
    bucketed_db,
    partitioned_bucketed_db,
    table_bytes as _table_bytes,
)
from icechunk_spark.operators.tpch import Q3_SQL, Q5_SQL, Q9_SQL

#: on-disk size above which a customer-derived side is NOT force-
#: broadcast (the hint overrides Spark's size check, so an unbounded
#: hint on an SF-scaling side is a driver/executor OOM at large SF —
#: the exact trap raw q5's docstring rejects).  1 GiB of customer
#: parquet ≈ sf40; the filtered 3-column ASIA projection of that is
#: ~50 MB serialized — comfortably broadcastable.  Past the cap the
#: code falls back to an unhinted join and AQE's runtime-measured
#: conversion makes the broadcast call safely.
BROADCAST_SRC_CAP_BYTES = 1 << 30


def _q3_shape(spark: SparkSession, sf_dir: str, li, orders) -> DataFrame:
    """The shared q3 join/agg spine over pre-filtered bucketed facts:
    size-gated BUILDING broadcast semi-filter -> exchange-free
    SHUFFLE_HASH fact join -> co-located aggregation -> top 10.
    q3_bucketed / q3_partitioned / q3_partitioned_tight differ ONLY in
    which table layout and which date/partition predicates feed
    ``li``/``orders`` — one implementation so a join-shape change
    can't silently diverge the registered variants (review r11)."""
    cust = (
        load_tables(spark, sf_dir)["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    if _table_bytes(sf_dir, "customer") <= BROADCAST_SRC_CAP_BYTES:
        orders = orders.join(
            broadcast(cust), F.col("o_custkey") == cust.c_custkey, "left_semi"
        )
        joined = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
    else:
        joined = li.join(
            orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
        ).join(cust, F.col("o_custkey") == cust.c_custkey, "left_semi")
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 over bucketed fact tables: the BUILDING customer semi-filter
    broadcasts onto bucketed ORDERS first (a broadcast join preserves
    the bucket partitioning, so the lineitem join stays co-located),
    shrinking the SMJ's match side ~5× and the aggregation input with
    it.  Measured vs the r8 join-first shape at sf10: 1.27 s vs 1.41 s
    best-window, identical values.  The broadcast hint is size-gated
    like q5's (BROADCAST_SRC_CAP_BYTES); past the cap the semi-filter
    falls back to probing the join output, where AQE can still convert
    it from runtime stats."""
    db = bucketed_db(spark, sf_dir)
    li = spark.table(f"{db}.lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    orders = spark.table(f"{db}.orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    # SHUFFLE_HASH on the (filtered, semi-reduced) orders build side:
    # over bucketed tables the hint yields an EXCHANGE-FREE hash join —
    # build one hash per bucket of the small side, stream lineitem
    # through it — instead of a sort-merge whose per-row comparisons
    # dominate once both sorts are already elided.  Measured at sf10
    # (interleaved, min-of-5): 0.96 s vs 1.39 s SMJ, identical values.
    # Per-task build = one orders bucket after both filters; the
    # suggest_buckets sizing rule keeps a bucket ≤ a task's memory
    # comfortably, so the build side scales with the rule.
    return _q3_shape(spark, sf_dir, li, orders)


def q5_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 over bucketed facts.  The dimension chain
    (region→nation→customer) broadcasts onto orders, which PRESERVES
    orders' bucket partitioning — so the big lineitem ⋈ ob join stays
    co-located and only the 25-row n_name aggregate exchanges.

    NOT a copy of tpch.q5_local_supplier: the join order and the
    broadcast hints here are load-bearing for co-location.  A
    delegation experiment (raw pipeline with the fact frames swapped)
    measured 4.9 s vs 1.2 s at sf10 — without the hint the
    orders ⋈ cust join statically plans an o_custkey exchange that
    destroys orders' bucketing before lineitem ever joins it.

    The cust hint is SIZE-GATED (BROADCAST_SRC_CAP_BYTES): cust scales
    with SF, and a forced hint overrides Spark's own size check — at
    very large SF the gate drops the hint and the plan degrades to a
    shuffled cust join (one extra exchange, no OOM), with AQE free to
    re-promote the broadcast from runtime stats."""
    db = bucketed_db(spark, sf_dir)
    cust = _q5_cust_side(spark, sf_dir)
    orders = spark.table(f"{db}.orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return _q5_shape(spark, sf_dir, spark.table(f"{db}.lineitem"), orders, cust)


def _q5_shape(
    spark: SparkSession, sf_dir: str, li, orders, cust
) -> DataFrame:
    """The shared q5 join/agg spine over pre-filtered co-located facts
    (q5_bucketed / q5_partitioned differ only in which layout and
    which date/partition predicates feed ``li``/``orders``; ``cust``
    is the dimension-chain-filtered, size-gated-broadcast customer
    side).  SHUFFLE_HASH on ob (same rationale as q3: exchange-free
    hash join over buckets beats the merge's per-row comparisons; the
    r9 global-conf probe said SHJ was worse for q5 — that toggle also
    changed OTHER joins; the per-join hint measured 0.84 s vs 1.13 s
    SMJ interleaved at sf10, identical values)."""
    t = load_tables(spark, sf_dir)
    ob = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    return (
        li
        .join(ob.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _q5_cust_side(spark: SparkSession, sf_dir: str):
    """q5's dimension chain (region→nation→customer), size-gated for
    broadcast — shared by the bucketed and partitioned variants."""
    t = load_tables(spark, sf_dir)
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    nat = t["nation"].join(
        broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = t["customer"].join(
        broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    if _table_bytes(sf_dir, "customer") <= BROADCAST_SRC_CAP_BYTES:
        cust = broadcast(cust)
    return cust


def q9_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 over bucketed facts: the lineitem ⋈ orders spine is
    co-located; the part join still exchanges once its side outgrows
    the broadcast threshold (partsupp-style key, not the bucket key)
    — one shuffle instead of three.

    NOT a copy of tpch.q9_product_profit: raw q9 joins part FIRST,
    which shuffles lineitem by l_partkey and would destroy the bucket
    partitioning before the orders join.  Here orders joins first
    (co-located), part after.  Delegation measured 5.9 s vs 2.8 s at
    sf10 — the different join order is the point of this variant."""
    db = bucketed_db(spark, sf_dir)
    return _q9_shape(
        spark,
        sf_dir,
        spark.table(f"{db}.lineitem"),
        spark.table(f"{db}.orders"),
        F.year("o_orderdate").cast("bigint"),
    )


def _q9_shape(
    spark: SparkSession, sf_dir: str, li, orders, o_year_col
) -> DataFrame:
    """The shared q9 join/agg spine over co-located facts
    (q9_bucketed / q9_partitioned differ only in layout and in where
    ``o_year`` comes from — computed vs read off the partition
    directory).  Per-join SHUFFLE_HASH (see q3/q5): 2.1-2.3 s vs
    2.3-3.3 s SMJ interleaved at sf10, identical values."""
    t = load_tables(spark, sf_dir)
    green = t["part"].filter(F.col("p_name").contains("e")).select(
        "p_partkey", "p_retailprice"
    )
    df = (
        li
        .join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(green, F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", o_year_col)
        .withColumn(
            "amount",
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity") * 0.1,
        )
    )
    return (
        df.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(money_sum("amount").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


def q3_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 over YEAR-PARTITIONED bucketed facts (VERDICT r9 #6): the
    composed 100 TB layout.  The date predicates gain their implied
    partition-column twins (l_shipdate > 1996-03-15 ⇒ l_year >= 1996,
    o_orderdate < 1998-03-15 ⇒ o_year <= 1998 — the standard
    Hive-layout idiom, since plain parquet tables have no transform
    pruning), so the scans prune whole year directories at planning
    time AND the bucket layout elides both fact exchanges in the same
    plan.  SHUFFLE_HASH is load-bearing here: with one sorted file
    per (year, bucket) the scan reports hash partitioning but not
    per-bucket order, so an SMJ would re-sort both sides.  Pinned in
    tests/test_bucketed_sampling_pii.py (PartitionFilters + zero
    hash exchanges + identical rows to raw q3)."""
    db = partitioned_bucketed_db(spark, sf_dir)
    li = spark.table(f"{db}.lineitem").filter(
        (F.col("l_year") >= F.lit(1996))
        & (F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz"))
    )
    orders = spark.table(f"{db}.orders").filter(
        (F.col("o_year") <= F.lit(1998))
        & (F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz"))
    )
    return _q3_shape(spark, sf_dir, li, orders)


QUERIES = {
    "q3_bucketed": q3_bucketed,
    "q3_partitioned": q3_partitioned,
    "q5_bucketed": q5_bucketed,
    "q9_bucketed": q9_bucketed,
}

ORACLES = {
    "q3_bucketed": Q3_SQL,
    "q3_partitioned": Q3_SQL,
    "q5_bucketed": Q5_SQL,
    "q9_bucketed": Q9_SQL,
}
