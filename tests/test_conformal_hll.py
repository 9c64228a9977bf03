"""conformal_outliers + hll_mergeable_distinct: statistical
guarantees + plan pins."""

from __future__ import annotations

from icechunk_spark.operators.conformal import conformal_outliers
from icechunk_spark.operators.hllmerge import hll_mergeable_distinct

from .conftest import SF_DIR


def test_conformal_validity_bounds_flag_rate(spark):
    rows = conformal_outliers(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # finite-sample conformal validity: #{p_i <= alpha} <= alpha*n
        # exactly (p-values are k/n with tie-inclusive k), and the
        # flagged set is nonEMPTY only when some score clears 1/20
        assert r["n_flagged"] * 20 <= r["n_vectors"]
        assert 0.0 <= r["frac_flagged"] <= 0.05
        assert r["n_vectors"] > 0


def test_conformal_plan_stays_jvm(spark):
    df = conformal_outliers(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_hll_union_estimate_matches_exact_here(spark):
    rows = hll_mergeable_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["estimate_within_tol"], dict(r.asDict())
        assert r["exact_distinct"] > 0
        assert r["n_days"] > 0
