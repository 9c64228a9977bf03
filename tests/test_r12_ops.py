"""r12 second-wave operators: stream_hll_distinct, rfm_segments,
profile_table — semantic invariants + plan hygiene (values are
oracle-checked by tools/check.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.hllmerge import hll_mergeable_distinct
from icechunk_spark.operators.profiler import PROFILE_COLS, profile_table
from icechunk_spark.operators.rfm import rfm_segments
from icechunk_spark.operators.streaming_hll import stream_hll_distinct

from .conftest import SF_DIR


def test_stream_hll_matches_batch_twin(spark):
    """HLL register merge is commutative/associative, so the
    stream-accumulated sketches must union to the same estimate the
    batch op computes — rows identical (exact counts, n_days, tol)."""
    stream_rows = [tuple(r) for r in stream_hll_distinct(spark, SF_DIR).collect()]
    batch_rows = [tuple(r) for r in hll_mergeable_distinct(spark, SF_DIR).collect()]
    assert stream_rows == batch_rows and stream_rows
    assert all(r[-1] for r in stream_rows)  # estimate_within_tol


def test_rfm_invariants(spark):
    rows = rfm_segments(spark, SF_DIR).collect()
    assert rows
    orders = load_tables(spark, SF_DIR)["orders"]
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_quartile"] <= 4
        assert 1 <= r["f_quartile"] <= 4
        assert 1 <= r["m_quartile"] <= 4
        assert r["avg_monetary_dollars"] > 0
    # monetary quartiles order real money: for fixed (r, f), a higher
    # m_quartile segment's avg must exceed a lower one's
    by_rf: dict = {}
    for r in rows:
        by_rf.setdefault((r["r_quartile"], r["f_quartile"]), []).append(r)
    checked = 0
    for segs in by_rf.values():
        segs = sorted(segs, key=lambda r: r["m_quartile"])
        for a, b in zip(segs, segs[1:]):
            assert a["avg_monetary_dollars"] < b["avg_monetary_dollars"], (a, b)
            checked += 1
    assert checked  # the invariant actually ran


def test_profile_table_invariants_and_one_scan(spark):
    rows = {r["col_name"]: r for r in profile_table(spark, SF_DIR).collect()}
    assert set(rows) == set(PROFILE_COLS)
    orders = load_tables(spark, SF_DIR)["orders"]
    n = orders.count()
    for c, r in rows.items():
        assert r["n_rows"] == n
        assert r["n_null"] == 0  # testdata orders has no nulls
        assert 0 < r["n_distinct"] <= n
        assert r["min_value"] <= r["max_value"]
        assert r["avg_len"] > 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    # plan: ONE scan of orders feeds every column's aggregates (a lazy
    # per-column union re-planned the corpus aggregation per column —
    # 8 FileScans for 4 columns — which is why the unpivot is a
    # driver-side local_df over the collected 1-row aggregate)
    from icechunk_spark.operators.profiler import profile_agg_frame

    agg = profile_agg_frame(load_tables(spark, SF_DIR)["orders"])
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE repeats the tree
    assert final.count("FileScan parquet") == 1, final
    assert "BatchEvalPython" not in final


def test_profile_distinct_excludes_nulls(spark):
    """count(DISTINCT c) semantics: NULL is not a value (review r12 —
    the first shape counted the NULL group and diverged from the
    oracle by one on nullable columns)."""
    from icechunk_spark.engine import local_df
    from icechunk_spark.operators.profiler import (
        PROFILE_COLS,
        profile_distinct_frame,
    )

    rows = [
        {"o_orderkey": 1, "o_custkey": None, "o_orderstatus": "F", "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 2, "o_custkey": 7, "o_orderstatus": None, "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 3, "o_custkey": 7, "o_orderstatus": "F", "o_orderpriority": None},
    ]
    df = local_df(
        spark,
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_orderpriority string",
    )
    nd = {r["i"]: r["nd"] for r in profile_distinct_frame(df).collect()}
    assert nd == {0: 3, 1: 1, 2: 1, 3: 1}, (nd, PROFILE_COLS)


def test_profile_table_all_null_column(spark, monkeypatch):
    """An all-NULL profiled column must profile, not crash (ADVICE
    r12): the distinct pass emits no row for it (n_distinct = 0, the
    count(DISTINCT) answer) and avg_len propagates NULL like the
    oracle's sum(length(...)) does."""
    import icechunk_spark.operators.profiler as prof
    from icechunk_spark.engine import local_df

    rows = [
        {"o_orderkey": 1, "o_custkey": None, "o_orderstatus": "F", "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 2, "o_custkey": None, "o_orderstatus": "O", "o_orderpriority": "2-HIGH"},
    ]
    df = local_df(
        spark,
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_orderpriority string",
    )
    monkeypatch.setattr(prof, "load_tables", lambda s, d: {"orders": df})
    out = {r["col_name"]: r for r in prof.profile_table(spark, "ignored").collect()}
    nullcol = out["o_custkey"]
    assert nullcol["n_rows"] == 2 and nullcol["n_null"] == 2
    assert nullcol["n_distinct"] == 0
    assert nullcol["min_value"] is None and nullcol["max_value"] is None
    assert nullcol["avg_len"] is None
    assert out["o_orderkey"]["n_distinct"] == 2
