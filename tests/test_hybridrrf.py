"""hybrid_retrieval_rrf: fusion invariants + plan pin."""

from __future__ import annotations

from icechunk_spark.operators.hybridrrf import HY_POOL, K_RRF, hybrid_retrieval_rrf
from icechunk_spark.operators.retrieval import RET_QUERIES, RET_TOPK

from .conftest import SF_DIR


def test_rrf_invariants(spark):
    rows = hybrid_retrieval_rrf(spark, SF_DIR).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_doc"], []).append(r)
        assert r["in_sparse"] or r["in_dense"]
        # score bounds: one list floor, two lists ceiling
        assert 1.0 / (K_RRF + HY_POOL) - 1e-9 <= r["rrf_score"] <= 2.0 / (K_RRF + 1) + 1e-9
        assert r["match_doc"] != r["query_doc"]
    assert set(per_q) == set(range(RET_QUERIES))
    for q, rs in per_q.items():
        ranks = [r["rnk"] for r in sorted(rs, key=lambda x: x["rnk"])]
        assert ranks == list(range(1, RET_TOPK + 1))
        scores = [r["rrf_score"] for r in sorted(rs, key=lambda x: x["rnk"])]
        assert scores == sorted(scores, reverse=True)


def test_rrf_plan_stays_jvm(spark):
    df = hybrid_retrieval_rrf(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
