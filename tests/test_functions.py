"""Shared-function tests: skew-mitigation helpers must be result-
equivalent to their unsalted counterparts (salting changes the
physical distribution of work, never the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions.skew import salted_agg, salted_join, with_salt

from .conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    plain = {
        (r["l_returnflag"],): (r["qty"], r["cnt"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (round(r["qty"], 2), r["cnt"], r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "qty": ("sum", "l_quantity"),
                "cnt": ("count", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            n_salts=8,
        ).collect()
    }
    assert {k: (round(v[0], 2), v[1], v[2]) for k, v in plain.items()} == salted


def test_salted_join_matches_plain(spark):
    t = load_tables(spark, SF_DIR)
    li = t["lineitem"].select("l_orderkey", "l_extendedprice")
    orders = t["orders"].select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    salted = (
        salted_join(li, orders, F.col("l_orderkey") == F.col("o_orderkey"), n_salts=4)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert {r["o_orderpriority"]: r["count"] for r in plain} == {
        r["o_orderpriority"]: r["count"] for r in salted
    }


def test_with_salt_bounds(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    mx = with_salt(li, 16).agg(F.max("__salt"), F.min("__salt")).collect()[0]
    assert 0 <= mx[1] and mx[0] <= 15


def test_cms_bounds(spark):
    from icechunk_spark.operators.analytics_ext import sketch_event_counts

    rows = sketch_event_counts(spark, SF_DIR).collect()
    assert len(rows) == 5
    # the one-sided CMS guarantee is computed in the operator itself
    # (exact <= estimate <= exact + eps*N) and emitted as a boolean
    assert all(r["within_bounds"] for r in rows)
    assert all(r["exact_count"] > 0 for r in rows)


def test_load_tables_caches_handles(spark, tmp_path):
    """Table handles are cached per (session, dir) — the lazy plans
    come back identical (no footer re-reads) — and clear_table_cache
    drops them; a different dir gets its own entry."""
    from icechunk_spark.catalog import clear_table_cache, load_tables

    from .conftest import SF_DIR

    clear_table_cache()
    a = load_tables(spark, SF_DIR)
    b = load_tables(spark, SF_DIR)
    assert a["lineitem"] is b["lineitem"]
    # the returned dict is a copy: callers may mutate it safely
    a["lineitem"] = None
    assert load_tables(spark, SF_DIR)["lineitem"] is b["lineitem"]
    clear_table_cache()
    c = load_tables(spark, SF_DIR)
    assert c["lineitem"] is not b["lineitem"]
    # results identical either way
    assert c["lineitem"].count() == b["lineitem"].count()
