"""sparse_retrieval + welch_drift_ttest: pure-Python references +
plan pins (both engines could share an oracle bug; these can't)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from icechunk_spark.operators.retrieval import (
    Q_TERMS,
    RET_QUERIES,
    RET_TOPK,
    sparse_retrieval,
)
from icechunk_spark.operators.ttest import welch_drift_ttest

from .conftest import SF_DIR


def test_retrieval_matches_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    tf = {d: Counter(w for w in t.split() if w) for d, t in rows}
    n = len(tf)
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    w = {
        d: {t: cnt * math.log((n + 1.0) / (df[t] + 1.0)) for t, cnt in c.items()}
        for d, c in tf.items()
    }
    norms = {d: math.sqrt(sum(v * v for v in ws.values())) for d, ws in w.items()}
    expected = {}
    for q in range(RET_QUERIES):
        qw = dict(
            sorted(w[q].items(), key=lambda kv: (-kv[1], kv[0]))[:Q_TERMS]
        )
        scores = []
        for d, ws in w.items():
            if d == q:
                continue
            dp = sum(qv * ws[t] for t, qv in qw.items() if t in ws)
            if dp:
                scores.append((d, dp / (norms[q] * norms[d])))
        scores.sort(key=lambda x: (-round(x[1], 6), x[0]))
        expected[q] = scores[:RET_TOPK]
    got = defaultdict(list)
    for r in sparse_retrieval(spark, SF_DIR).collect():
        got[r["query_doc"]].append((r["match_doc"], r["score"]))
    assert set(got) == set(expected)
    for q in expected:
        assert [m for m, _ in got[q]] == [m for m, _ in expected[q]], (
            q,
            got[q],
            expected[q],
        )
        for (gm, gs), (em, es) in zip(got[q], expected[q]):
            assert abs(gs - es) < 1e-4  # per-term 10dp rounding slack


def test_welch_matches_python_reference(spark):
    rows = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(ts), CAST(round(value * 100) AS BIGINT)
        FROM '{SF_DIR}/events.parquet'
        """
    ).fetchall()
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    mid = lo + (hi - lo) // 2
    halves = defaultdict(lambda: ([], []))
    for et, tus, c in rows:
        halves[et][1 if tus > mid else 0].append(c)
    got = {r["event_type"]: r for r in welch_drift_ttest(spark, SF_DIR).collect()}
    for et, (h1, h2) in halves.items():
        if len(h1) < 2 or len(h2) < 2:
            assert et not in got
            continue
        n1, n2 = float(len(h1)), float(len(h2))
        s1, s2 = float(sum(h1)), float(sum(h2))
        q1, q2 = float(sum(c * c for c in h1)), float(sum(c * c for c in h2))
        v1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - 1.0))
        v2 = (n2 * q2 - s2 * s2) / (n2 * (n2 - 1.0))
        t = (s1 / n1 - s2 / n2) / math.sqrt(v1 / n1 + v2 / n2)
        r = got[et]
        assert r["n1"] == len(h1) and r["n2"] == len(h2)
        assert abs(r["t_stat"] - t) < 1e-5
        assert r["mean_drifted"] == (abs(round(t, 6)) > 1.96)


def test_retrieval_plan_stays_jvm(spark):
    df = sparse_retrieval(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
