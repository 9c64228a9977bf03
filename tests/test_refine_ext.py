"""Semantic invariants for the refinement/selection operators beyond
the oracle gate: internal consistency a value-hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.linedup import line_dedup
from icechunk_spark.operators.refine_ext import (
    MMR_K,
    clean_reassemble,
    event_decay_score,
    mmr_diversify,
    quality_quantile_norm,
)

from .conftest import SF_DIR


def test_clean_reassemble_agrees_with_line_dedup(spark):
    """Same line universe, same keep decisions: the stats columns must
    equal line_dedup's, and clean_fp is NULL exactly on fully-dropped
    docs."""
    rows = {r.doc_id: r for r in clean_reassemble(spark, SF_DIR).collect()}
    stats = {r.doc_id: r for r in line_dedup(spark, SF_DIR).collect()}
    assert rows.keys() == stats.keys()
    for doc_id, r in rows.items():
        s = stats[doc_id]
        assert (r.n_lines, r.kept_lines) == (s.n_lines, s.kept_lines)
        assert (r.clean_fp is None) == (r.kept_lines == 0)
        if r.clean_fp is not None:
            assert len(r.clean_fp) == 32  # md5 hex


def test_quality_quantile_norm_invariants(spark):
    df = quality_quantile_norm(spark, SF_DIR)
    rows = df.collect()
    t = load_tables(spark, SF_DIR)
    assert len(rows) == t["documents"].count()
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0.0 <= r.q_norm <= 1.0
        assert 0 <= r.decile <= 9
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        if len(rs) > 1:
            assert max(r.q_norm for r in rs) == 1.0, src
            assert min(r.q_norm for r in rs) == 0.0, src
        # q_norm must order exactly like (quality, doc_id)
        ordered = sorted(rs, key=lambda r: (r.quality, r.doc_id))
        assert [r.q_norm for r in ordered] == sorted(r.q_norm for r in rs)


def test_event_decay_score_invariants(spark):
    rows = event_decay_score(spark, SF_DIR).collect()
    t = load_tables(spark, SF_DIR)
    ev = t["events"]
    assert sum(r.n_events for r in rows) == ev.count()
    assert len(rows) == ev.select("user_id").distinct().count()
    # decay weights are in (0, 1]: |score| is bounded by sum(|value|)
    bounds = {
        r["user_id"]: r["b"]
        for r in ev.groupBy("user_id").agg(F.sum(F.abs("value")).alias("b")).collect()
    }
    for r in rows:
        assert abs(r.decay_score) <= bounds[r.user_id] + 1e-6


def test_mmr_diversify_invariants(spark):
    rows = mmr_diversify(spark, SF_DIR).collect()
    assert [r.rnk for r in rows] == list(range(1, MMR_K + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids), "a vector was selected twice"
    # step 1 is pure relevance: must match the independent top-1
    from icechunk_spark.functions import cosine
    from icechunk_spark.operators.refine_ext import MMR_QUERY_ID
    from icechunk_spark.operators.similarity import N_QUERIES

    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("qe")
    )
    top1 = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine(F.col("qe"), F.col("embedding")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .collect()[0]
    )
    assert rows[0].vec_id == top1.vec_id
    # marginal scores are non-increasing from step 2 on (the chosen set
    # only grows, so every candidate's max-sim penalty only grows);
    # 1e-4 slack for the 4-decimal output rounding
    for a, b in zip(rows[1:], rows[2:]):
        assert b.mmr_score <= a.mmr_score + 1e-4


def test_fps_sample_invariants(spark):
    from icechunk_spark.operators.refine_ext import FPS_K, fps_sample
    from icechunk_spark.operators.similarity import N_QUERIES

    rows = fps_sample(spark, SF_DIR).collect()
    assert [r.rnk for r in rows] == list(range(1, FPS_K + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)
    t = load_tables(spark, SF_DIR)
    pool_min = (
        t["embeddings"]
        .filter(F.col("vec_id") >= N_QUERIES)
        .agg(F.min("vec_id"))
        .collect()[0][0]
    )
    assert rows[0].vec_id == pool_min and rows[0].min_dist is None
    # k-center greedy: the min-distance-to-chosen of successive picks
    # is non-increasing (the chosen set only grows); 1e-4 rounding slack
    for a, b in zip(rows[1:], rows[2:]):
        assert b.min_dist <= a.min_dist + 1e-4
    for r in rows[1:]:
        assert 0.0 <= r.min_dist <= 2.0 + 1e-9


def test_dround_matches_duckdb_round():
    """_dround is the oracle-parity contract for driver-side greedy
    scores: it must equal DuckDB's round(DOUBLE, k) bit-for-bit on
    arbitrary doubles (Python's built-in round is half-even and
    diverges on midpoints)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from icechunk_spark.operators.refine_ext import _dround

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        st.integers(min_value=0, max_value=6),
    )
    def check(x, d):
        expected = con.execute("SELECT round(CAST(? AS DOUBLE), ?)", [x, d]).fetchone()[0]
        assert _dround(x, d) == expected, (x, d)

    check()
    # explicit midpoints (the cases banker's rounding would flip)
    for x, d, want in [(0.5, 0, 1.0), (1.5, 0, 2.0), (-0.5, 0, -1.0), (2.5, 0, 3.0), (0.25, 1, 0.3), (-0.25, 1, -0.3)]:
        got = con.execute(f"SELECT round(CAST({x!r} AS DOUBLE), {d})").fetchone()[0]
        assert got == want and _dround(x, d) == want, (x, d, got)


def test_fps_driver_fast_path_equals_distributed(spark):
    """r14: the bounded-pool driver FPS must reproduce the distributed
    per-round argmax selection bit-for-bit (same picks, same rounded
    min_dist) — the fast path is a protocol change, not a semantic
    one."""
    import icechunk_spark.operators.refine_ext as rx

    fast = rx.fps_sample(spark, SF_DIR).collect()
    orig = rx._fps_driver_fast_path
    rx._fps_driver_fast_path = lambda *a, **k: None  # force distributed
    try:
        slow = rx.fps_sample(spark, SF_DIR).collect()
    finally:
        rx._fps_driver_fast_path = orig
    assert [tuple(r) for r in fast] == [tuple(r) for r in slow]
