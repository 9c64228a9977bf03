"""Perceptual media near-dup (operators/medianear.py): candidate
cardinality must stay sub-quadratic (banded LSH, never all-pairs),
exact duplicates must collapse to one representative BEFORE banding,
and the hamming verify must bound the output."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.operators.medianear import (
    HAM_MAX,
    N_BANDS,
    media_neardup,
    media_signatures,
)

from .conftest import SF_DIR

SF001 = "/root/testdata/sf0.01"


def test_candidates_far_below_all_pairs(spark):
    sigs = media_signatures(spark, SF001).persist()
    n = sigs.count()
    all_pairs = n * (n - 1) // 2
    band_arr = F.array(*[F.col(f"b{k}") for k in range(N_BANDS)])
    buckets = sigs.select("media_id", F.posexplode(band_arr).alias("band", "key"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select("a.media_id", "b.media_id")
        .distinct()
        .count()
    )
    sigs.unpersist()
    assert cands < all_pairs / 10, f"{cands} candidates vs {all_pairs} pairs"


def test_exact_dups_collapse_to_one_representative(spark):
    # identical payloads share every band; without the rep collapse a
    # d-sized exact-dup cluster puts d^2 pairs in all 4 buckets
    sigs = media_signatures(spark, SF001)
    assert sigs.groupBy(*[f"b{k}" for k in range(N_BANDS)], "media_id").count().filter(
        F.col("count") > 1
    ).count() == 0
    # representatives are unique ids
    assert sigs.select("media_id").distinct().count() == sigs.count()


def test_neardup_pairs_bounded_and_ordered(spark):
    out = media_neardup(spark, SF001)
    rows = out.collect()
    assert all(r.hamming <= HAM_MAX for r in rows)
    assert all(r.media_id_a < r.media_id_b for r in rows)
    # deterministic: a second run returns the identical pair set
    again = {(r.media_id_a, r.media_id_b, r.hamming) for r in media_neardup(spark, SF001).collect()}
    assert {(r.media_id_a, r.media_id_b, r.hamming) for r in rows} == again


def test_signature_bands_are_16bit(spark):
    sigs = media_signatures(spark, SF_DIR)
    bad = sigs.filter(
        " OR ".join(f"(b{k} < 0 OR b{k} > 65535)" for k in range(N_BANDS))
    ).count()
    assert bad == 0
