"""random_projection: JL distortion bound + plan pins."""

from __future__ import annotations

from icechunk_spark.operators.projection import RP_DOUT, random_projection

from .conftest import SF_DIR


def test_projection_preserves_cosine_within_jl_bound(spark):
    rows = random_projection(spark, SF_DIR).collect()
    assert rows, "no pairs audited"
    # k=16 signed projection: per-pair cosine error concentrates around
    # 1/sqrt(k) = 0.25; label-level MEANS must sit well inside it
    for r in rows:
        assert 0.0 <= r["mean_abs_err"] < 0.30, dict(r.asDict())
        assert r["max_abs_err"] <= 2.0  # cosine range bound
        assert r["n_pairs"] > 0
    assert RP_DOUT == 16


def test_projection_plan_broadcasts_signs_and_stays_jvm(spark):
    df = random_projection(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the 64x16 sign table broadcasts onto the exploded components
    assert "BroadcastHashJoin" in plan
