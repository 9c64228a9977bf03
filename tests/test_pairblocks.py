"""Equality pins for the blocked numpy pair pass (pairblocks.py) vs
the JVM pair join — the two forms each of pairwise_topk / semdedup
dispatches between must be VALUE-IDENTICAL, and the kernel's raw
cosines must be bit-identical to the JVM strict-left-fold arithmetic
(that is the whole premise of the rewrite; see the pairblocks module
docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _load_emb(spark):
    from icechunk_spark.catalog import load_tables

    return load_tables(spark, SF_DIR)["embeddings"].select(
        "vec_id", "label", "embedding"
    )


def test_kernel_raw_cosines_bit_identical_to_jvm(spark, monkeypatch):
    """Every raw pair cosine out of the tile iterator equals the JVM
    dot/(na*nb) double bit-for-bit, including across tile boundaries
    (small _TILE forces many tiles) and across the diagonal mask."""
    import numpy as np

    from icechunk_spark import functions as fns
    from icechunk_spark.operators import pairblocks as pb

    monkeypatch.setattr(pb, "_TILE", 37)  # prime, forces ragged tiles

    emb = _load_emb(spark).filter(F.col("label") == 0).limit(90)
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    A = np.array([r.embedding for r in rows], dtype=np.float32).astype(np.float64)

    a, b = emb.alias("a"), emb.alias("b")
    jvm = {
        (r.ia, r.ib): r.c
        for r in a.join(
            b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id"))
        )
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            fns.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .collect()
    }
    assert len(jvm) == len(ids) * (len(ids) - 1) // 2

    seen = 0
    for i0, j0, cos, valid in pb._iter_cos_tiles(ids, A, ids, A, diagonal=True):
        m, n = cos.shape
        for di in range(m):
            for dj in range(n):
                if valid is not None and not valid[di, dj]:
                    continue
                key = (int(ids[i0 + di]), int(ids[j0 + dj]))
                assert cos[di, dj] == jvm[key], key  # exact doubles
                seen += 1
    assert seen == len(jvm)


@pytest.mark.parametrize("blk,tile", [(64, 48), (4096, 512)])
def test_pairwise_topk_paths_equal(spark, monkeypatch, blk, tile):
    """Blocked pass (multi-block and single-block layouts) returns the
    exact rows of the JVM join form."""
    from icechunk_spark.operators import pairblocks as pb
    from icechunk_spark.operators import similarity as sim

    monkeypatch.setattr(pb, "PAIR_BLOCK", blk)
    monkeypatch.setattr(pb, "_TILE", tile)

    emb = _load_emb(spark)
    join_rows = [tuple(r) for r in sim._pairwise_topk_join(spark, emb).collect()]
    blocked_rows = [tuple(r) for r in sim._pairwise_topk_blocked(emb).collect()]
    assert join_rows == blocked_rows
    assert len(join_rows) > 0


@pytest.mark.parametrize("threshold", [0.30, -1.0])
def test_semdedup_paths_equal(spark, monkeypatch, threshold):
    """Blocked pass produces the identical per-cluster dedup summary.
    threshold=-1.0 makes EVERY pair a duplicate so the max-merge /
    monotone-rounding argument is exercised on dense output, not just
    the sparse default."""
    from icechunk_spark.operators import pairblocks as pb
    from icechunk_spark.operators import semdedup as sd

    monkeypatch.setattr(pb, "PAIR_BLOCK", 64)
    monkeypatch.setattr(pb, "_TILE", 48)
    monkeypatch.setattr(sd, "SEMDEDUP_THRESHOLD", threshold)

    emb = _load_emb(spark)

    def summary(dups):
        return (
            emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"))
            .join(dups, "label", "left")
            .select(
                "label",
                F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
            )
            .orderBy("label")
            .collect()
        )

    join_rows = summary(sd._dups_join(spark, emb))
    blocked_rows = summary(sd._dups_blocked(emb))
    assert [tuple(r) for r in join_rows] == [tuple(r) for r in blocked_rows]
    if threshold == -1.0:
        # dense case really is dense: every non-first vector is a dup
        assert all(r.n_dups > 0 for r in join_rows)


def test_dispatch_thresholds(spark):
    """sf0.001 (500 rows) must take the JVM join path; the blocked
    path requires >= PAIR_FAST_MIN_ROWS.  Pins the footer-count
    dispatch so a refactor can't silently flip the small-SF path."""
    from icechunk_spark.operators import pairblocks as pb

    emb = _load_emb(spark)
    n = pb.emb_rows(emb, SF_DIR)
    assert n == 500
    assert n < pb.PAIR_FAST_MIN_ROWS
