"""r12 wave-4 operators: daily_active_users + pca_project — semantic
invariants and an independent numpy PCA cross-check (values are
oracle-checked by tools/check.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.activeusers import daily_active_users
from icechunk_spark.operators.pca import DIM, PCA_K, _moment_partials, pca_project

from .conftest import SF_DIR


def test_daily_active_users_invariants(spark):
    rows = daily_active_users(spark, SF_DIR).collect()
    assert rows
    ev = load_tables(spark, SF_DIR)["events"]
    total_users = ev.select("user_id").distinct().count()
    # cumulative distinct through the LAST day = all users ever seen
    assert rows[-1]["cumulative_distinct_users"] == total_users
    assert sum(r["new_users"] for r in rows) == total_users
    cum = 0
    for r in rows:
        assert r["active_users"] == r["new_users"] + r["returning_users"]
        assert 0 <= r["new_users"] <= r["active_users"]
        cum += r["new_users"]
        assert r["cumulative_distinct_users"] == cum
    # day 1: everyone active is new
    assert rows[0]["returning_users"] == 0


def test_pca_moments_match_numpy_and_audit_green(spark):
    """The distributed X^T X / mean partials must equal a straight
    numpy computation over the collected table — then the audit row's
    invariants must all hold."""
    emb = load_tables(spark, SF_DIR)["embeddings"]
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    xtx, sx, n = _moment_partials(emb)
    assert n == len(X)
    assert np.allclose(xtx, X.T @ X, rtol=1e-9, atol=1e-6)
    assert np.allclose(sx, X.sum(axis=0), rtol=1e-9, atol=1e-9)

    (row,) = pca_project(spark, SF_DIR).collect()
    assert row["n_vectors"] == len(X)
    assert row["dim"] == DIM and row["k"] == PCA_K
    assert row["variance_explained_valid"]
    assert row["beats_uniform_share"]
    assert row["axes_orthonormal"]
    assert row["energy_conserved"]


def test_stream_active_users_matches_batch_twin(spark):
    """Distinct-pair maintenance is idempotent across micro-batches:
    the streaming census rows must equal the batch twin's exactly."""
    from icechunk_spark.operators.streaming_active import stream_active_users

    stream_rows = [tuple(r) for r in stream_active_users(spark, SF_DIR).collect()]
    batch_rows = [tuple(r) for r in daily_active_users(spark, SF_DIR).collect()]
    assert stream_rows == batch_rows and stream_rows


def test_census_drops_null_days(spark):
    """NULL event timestamps must not produce a NULL-day census row
    (ADVICE r12: Spark windows order NULLS FIRST vs DuckDB's NULLS
    LAST — the cumulative running sum would diverge cross-engine)."""
    from icechunk_spark.engine import local_df
    from icechunk_spark.operators.activeusers import census_over_day_user

    du = local_df(
        spark,
        [
            {"day": "2024-01-01", "user_id": 1},
            {"day": None, "user_id": 2},
            {"day": "2024-01-02", "user_id": 1},
            {"day": "2024-01-02", "user_id": 2},
        ],
        "day string, user_id bigint",
    )
    rows = census_over_day_user(du).collect()
    assert [r["day"] for r in rows] == ["2024-01-01", "2024-01-02"]
    # user 2's NULL-day sighting does not count: first seen 2024-01-02
    assert [r["new_users"] for r in rows] == [1, 1]
    assert rows[-1]["cumulative_distinct_users"] == 2
