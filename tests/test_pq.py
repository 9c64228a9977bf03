"""pq_quantize: invariant row + codebook-shape checks + plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.pq import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    pq_quantize,
    train_pq_codebooks,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def books(spark):
    return train_pq_codebooks(load_tables(spark, SF_DIR)["embeddings"])


def test_pq_invariants_hold(spark):
    r = pq_quantize(spark, SF_DIR).collect()[0]
    assert r["n_vectors"] > 0
    assert r["m_subspaces"] == PQ_M and r["k_codes"] == PQ_K
    assert r["compression_x"] == 32  # 256 raw bytes -> 8 code bytes
    assert r["codebooks_half_used"]
    assert r["beats_mean_baseline"]
    assert r["rerank_recall_ok"]


def test_codebooks_have_pq_shape(books):
    assert len(books) == PQ_M
    for codes in books:
        assert [cid for cid, _ in codes] == list(range(PQ_K))
        assert all(len(c) == PQ_SUB for _, c in codes)
        # Lloyd means of float data must stay finite
        assert all(all(abs(x) < 1e6 for x in c) for _, c in codes)


def test_pq_encode_plan_stays_jvm(spark, books):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    from icechunk_spark.operators.pq import _argmin_struct, _books_lit, _sub_col

    lit = _books_lit(books)
    df = emb.select(
        "vec_id", *[_argmin_struct(_sub_col(m), F.element_at(lit, m + 1))["code"].alias(f"c{m}") for m in range(PQ_M)]
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_tiny_input_pads_codebooks_to_k(spark):
    """ADVICE r10: fewer than PQ_K seed rows must not leave a short
    codebook (element_at past the end -> NULL d2 structs).  Seeds are
    cycled to K; duplicated centroids lose argmin ties."""
    emb = (
        load_tables(spark, SF_DIR)["embeddings"]
        .orderBy("vec_id")
        .limit(3)
    )
    books = train_pq_codebooks(emb)
    for codes in books:
        assert [cid for cid, _ in codes] == list(range(PQ_K))
        assert all(len(c) == PQ_SUB for _, c in codes)


def test_empty_input_raises(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"].filter(F.lit(False))
    with pytest.raises(ValueError, match="empty embeddings"):
        train_pq_codebooks(emb)


def test_sampled_training_path_keeps_invariants(spark, monkeypatch):
    """Force the train-sample cap to bind (VERDICT r10 #7): codebooks
    trained on the md5-spread sample must keep full PQ shape and the
    query's oracle invariants must stay green."""
    import icechunk_spark.operators.pq as pqmod

    monkeypatch.setattr(pqmod, "PQ_TRAIN_CAP", 64)
    books = train_pq_codebooks(load_tables(spark, SF_DIR)["embeddings"])
    for codes in books:
        assert [cid for cid, _ in codes] == list(range(PQ_K))
    r = pq_quantize(spark, SF_DIR).collect()[0]
    assert r["beats_mean_baseline"] and r["codebooks_half_used"]


def test_numpy_encode_matches_jvm_argmin(spark, books):
    """The fused numpy re-encode inside the audit passes must assign
    the SAME codes as the JVM _argmin_struct expression (6dp-rounded
    d2, ties to the lower code id)."""
    import numpy as np

    from icechunk_spark.operators.pq import (
        _argmin_struct,
        _books_lit,
        _np_encode,
        _sub_col,
    )

    emb = load_tables(spark, SF_DIR)["embeddings"].orderBy("vec_id").limit(200)
    lit = _books_lit(books)
    jvm = emb.select(
        "vec_id",
        *[
            _argmin_struct(_sub_col(m), F.element_at(lit, m + 1))["code"].alias(f"c{m}")
            for m in range(PQ_M)
        ],
    ).collect()
    rows = emb.select("vec_id", "embedding").collect()
    e = np.array([[float(x) for x in r["embedding"]] for r in rows])
    book_mat = np.array([[c for _, c in books[m]] for m in range(PQ_M)])
    codes, _ = _np_encode(e, book_mat)
    jvm_codes = {r["vec_id"]: [r[f"c{m}"] for m in range(PQ_M)] for r in jvm}
    for i, r in enumerate(rows):
        assert list(codes[i]) == jvm_codes[r["vec_id"]], r["vec_id"]


def _force_distributed(monkeypatch):
    import icechunk_spark.operators.pq as pqmod

    monkeypatch.setattr(pqmod, "_train_driver_fast_path", lambda *a, **k: None)


def test_driver_fast_path_seeds_exactly_equal_distributed(spark, monkeypatch):
    """With zero Lloyd rounds the books ARE the seeds — no avg is
    involved, so the fast path must equal the distributed window form
    EXACTLY (same code ids, bit-identical vectors).  Pins the md5 /
    (hex, vec_id) ranking mirror."""
    import icechunk_spark.operators.pq as pqmod

    monkeypatch.setattr(pqmod, "PQ_LLOYD", 0)
    emb = load_tables(spark, SF_DIR)["embeddings"]
    fast = pqmod.train_pq_codebooks(emb)
    _force_distributed(monkeypatch)
    dist = pqmod.train_pq_codebooks(emb)
    assert fast == dist


def test_driver_fast_path_books_match_distributed(spark, monkeypatch):
    """Full Lloyd: assignment is bit-identical (same left-fold d2),
    means differ only by float summation order (F.avg partial order
    vs numpy) — books must agree to ulp-level tolerance and the
    operator's invariant row must be IDENTICAL on both paths."""
    import numpy as np

    import icechunk_spark.operators.pq as pqmod

    emb = load_tables(spark, SF_DIR)["embeddings"]
    fast = pqmod.train_pq_codebooks(emb)
    fast_row = pq_quantize(spark, SF_DIR).collect()
    _force_distributed(monkeypatch)
    dist = pqmod.train_pq_codebooks(emb)
    dist_row = pq_quantize(spark, SF_DIR).collect()
    for m in range(PQ_M):
        assert [cid for cid, _ in fast[m]] == [cid for cid, _ in dist[m]]
        np.testing.assert_allclose(
            np.array([c for _, c in fast[m]]),
            np.array([c for _, c in dist[m]]),
            rtol=1e-12,
            atol=1e-12,
        )
    assert [tuple(r) for r in fast_row] == [tuple(r) for r in dist_row]


def test_driver_fast_path_tiny_and_empty(spark, monkeypatch):
    """The fast path owns the bounded collect now: tiny inputs pad to
    PQ_K through the shared _seed_pad and empty inputs raise the same
    error the distributed path raised."""
    import icechunk_spark.operators.pq as pqmod

    tiny = load_tables(spark, SF_DIR)["embeddings"].orderBy("vec_id").limit(3)
    books = pqmod.train_pq_codebooks(tiny)
    for codes in books:
        assert [cid for cid, _ in codes] == list(range(PQ_K))
    empty = load_tables(spark, SF_DIR)["embeddings"].filter(F.lit(False))
    with pytest.raises(ValueError, match="empty embeddings"):
        pqmod.train_pq_codebooks(empty)
