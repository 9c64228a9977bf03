"""skew_salted_agg / skew_salted_join (r12): the salt must be
value-invisible (equivalence to the plain shapes) and the salted agg
plan must actually have TWO aggregation exchanges — (key, salt) then
key — or it isn't spreading the hot key at all."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.skewops import skew_salted_agg, skew_salted_join

from .conftest import SF_DIR


def test_salted_agg_equals_plain(spark):
    salted = [tuple(r) for r in skew_salted_agg(spark, SF_DIR).collect()]
    ev = load_tables(spark, SF_DIR)["events"].select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    plain = [
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("c").cast("bigint").alias("n_events"),
            F.sum("c").cast("bigint").alias("sum_cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .orderBy("event_type")
        .collect()
    ]
    assert salted == plain and salted


def test_salted_join_equals_plain(spark):
    salted = [tuple(r) for r in skew_salted_join(spark, SF_DIR).collect()]
    t = load_tables(spark, SF_DIR)
    plain = [
        tuple(r)
        for r in t["lineitem"]
        .select(
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("rc"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("rc").cast("bigint").alias("rev_cents"),
        )
        .orderBy("s_nationkey")
        .collect()
    ]
    assert salted == plain and salted


def test_salted_agg_plan_has_two_phases(spark):
    df = skew_salted_agg(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # phase 1 partitions by (event_type, __salt); phase 2 by event_type
    assert "hashpartitioning(event_type" in final, final
    assert "__salt" in final, final
    assert "BatchEvalPython" not in final
