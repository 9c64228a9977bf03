"""Scale-shape tests for the ANN corner: candidate cardinality must
stay far below n^2/2 (the all-pairs count), IVF centroids must be
genuinely trained, and the pairwise cohort cap must bind.  These are
the ANN analogs of tests/test_plans.py's pushdown/broadcast asserts —
they pin the *shape* of the computation, not just its values."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators import similarity
from icechunk_spark.operators.dedup import neardup_candidates
from icechunk_spark.operators.similarity import train_ivf_centroids

from .conftest import SF_DIR


def test_neardup_candidates_far_below_all_pairs(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    n = emb.count()
    all_pairs = n * (n - 1) // 2
    cands = neardup_candidates(emb).count()
    # 4 bands x 8 bits on random vectors: expect ~n^2/128; assert an
    # order of magnitude of headroom so drift is caught early
    assert cands < all_pairs / 10, f"{cands} candidates vs {all_pairs} pairs"
    assert cands > 0


def test_neardup_band_bits_param_shrinks_candidates(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    wide = neardup_candidates(emb, n_bands=4, band_bits=4).count()
    narrow = neardup_candidates(emb, n_bands=4, band_bits=8).count()
    assert narrow < wide  # more bits per band => fewer candidates


def test_ivf_centroids_are_trained(spark):
    emb = load_tables(spark, SF_DIR)["embeddings"]
    seeds = (
        emb.withColumn("__r", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__r", "vec_id")
        .limit(similarity.N_CELLS)
        .select("embedding")
        .collect()
    )
    init = [[float(x) for x in r["embedding"]] for r in seeds]
    cents = train_ivf_centroids(emb)
    assert len(cents) == similarity.N_CELLS
    assert all(len(c) == similarity.DIM for _, c in cents)
    moved = sum(1 for (_, c), s in zip(cents, init) if c != s)
    assert moved >= similarity.N_CELLS // 2, "Lloyd iterations did not move centroids"
    # the trained quantizer must actually partition the data
    assigned = emb.withColumn(
        "cell", F.element_at(similarity._cell_scores(F.col("embedding"), cents), 1)["cell"]
    )
    n_cells_used = assigned.select("cell").distinct().count()
    assert n_cells_used >= similarity.N_CELLS // 2


def test_pairwise_topk_label_cap_binds(spark, monkeypatch):
    monkeypatch.setattr(similarity, "PAIRWISE_LABEL_CAP", 3)
    out = similarity.pairwise_topk(spark, SF_DIR).collect()
    emb = load_tables(spark, SF_DIR)["embeddings"]
    allowed = {
        (r["label"], r["vec_id"])
        for r in emb.select(
            "label",
            "vec_id",
            F.row_number().over(Window.partitionBy("label").orderBy("vec_id")).alias("r"),
        )
        .filter(F.col("r") <= 3)
        .collect()
    }
    for r in out:
        assert (r["label"], r["vec_a"]) in allowed
        assert (r["label"], r["vec_b"]) in allowed


def test_dedup_cluster_star_equals_propagation(spark):
    """Large-star/small-star must produce the identical component-min
    labeling as min-label propagation."""
    from icechunk_spark.operators.dedup import dedup_cluster, dedup_cluster_star

    a = {(r["doc_id"], r["cluster_id"]) for r in dedup_cluster(spark, SF_DIR).collect()}
    b = {
        (r["doc_id"], r["cluster_id"]) for r in dedup_cluster_star(spark, SF_DIR).collect()
    }
    assert a == b and len(a) > 0


def test_partial_topk_invariant_under_partitioning(spark):
    """_partial_topk must return EXACTLY the global top-k for any
    input partitioning (1 partition, many, or skewed): the local-rank
    prefilter may never drop a global winner."""
    from icechunk_spark.operators.similarity import _partial_topk

    rows = [(i % 7, (i * 37) % 101, i) for i in range(500)]
    df = spark.createDataFrame(rows, "key int, score int, id int")
    order = [F.desc("score"), F.asc("id")]

    def run(d):
        return sorted(
            (r["key"], r["rnk"], r["id"], r["score"])
            for r in _partial_topk(d, ["key"], order, 5).collect()
        )

    w = Window.partitionBy("key").orderBy(*order)
    expected = sorted(
        (r["key"], r["rnk"], r["id"], r["score"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .collect()
    )
    assert run(df.repartition(1)) == expected
    assert run(df.repartition(64)) == expected
    assert run(df.repartition("key")) == expected
