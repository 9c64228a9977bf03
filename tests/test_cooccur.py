"""type_cooccurrence: set-algebra invariants + plan pins."""

from __future__ import annotations

import math

from icechunk_spark.operators.cooccur import type_cooccurrence

from .conftest import SF_DIR


def test_cooccurrence_invariants(spark):
    rows = type_cooccurrence(spark, SF_DIR).collect()
    assert rows
    types = set()
    for r in rows:
        types.add(r["type_a"])
        types.add(r["type_b"])
        assert r["type_a"] < r["type_b"]  # undirected, canonical order
        assert 0 < r["co_baskets"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0
        assert 0.0 < r["cosine_sim"] <= 1.0
        assert r["jaccard"] <= r["cosine_sim"] + 1e-9  # J <= cos always
    # every unordered pair of observed types appears at most once
    assert len(rows) <= math.comb(len(types), 2)


def test_cooccurrence_plan_broadcasts_counts(spark):
    df = type_cooccurrence(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
