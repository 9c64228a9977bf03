"""embedding_covariance r14 2nd pass: the triangle-explode product
stage must be value-identical to the old comps self-join on every
input shape — uniform vectors (triangle path), ragged / NULL-holed
vectors (self-join fallback), and a zero-length vector mixed into a
uniform table (filtered before sequence(), exactly as the join
produced no rows for it).  Expected values come from an independent
pure-Python Decimal mirror of the declared arithmetic."""

from __future__ import annotations

import os
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

Q12 = Decimal("1e-12")
Q8 = Decimal("1e-8")


def _mk_sf_dir(tmp_path, vecs):
    """Temp sf layout: custom embeddings + symlinks for every other
    table (load_tables eagerly opens all of them)."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in (
        "customer documents events lineitem nation orders part region supplier"
    ).split():
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    return d


def _expected(vecs):
    """Pure-Python mirror: per-cell decimal sums of HALF_UP-quantized
    double products (the CAST(double AS decimal(30,12)) semantics),
    then the declared double arithmetic + round(_, 8)."""
    cells = {}
    for _, emb, _ in vecs:
        comps = [
            (i, None if x is None else float(x)) for i, x in enumerate(emb)
        ]
        for i, x in comps:
            for j, y in comps:
                if i <= j:
                    # NULL components stay IN the pair set (count(*)
                    # counts the row); each sum skips its own NULLs
                    c = cells.setdefault(
                        (i, j), {"sxy": Decimal(0), "sx": Decimal(0), "sy": Decimal(0), "n": 0}
                    )
                    if x is not None and y is not None:
                        c["sxy"] += Decimal(x * y).quantize(Q12, ROUND_HALF_UP)
                    if x is not None:
                        c["sx"] += Decimal(x).quantize(Q12, ROUND_HALF_UP)
                    if y is not None:
                        c["sy"] += Decimal(y).quantize(Q12, ROUND_HALF_UP)
                    c["n"] += 1
    out = []
    for (i, j), c in sorted(cells.items()):
        cov = float(c["sxy"]) / c["n"] - (float(c["sx"]) / c["n"]) * (
            float(c["sy"]) / c["n"]
        )
        out.append((i, j, float(Decimal(cov).quantize(Q8, ROUND_HALF_UP))))
    return out


def _run(spark, d):
    from icechunk_spark.catalog import clear_table_cache
    from icechunk_spark.operators.curation_ext import embedding_covariance

    clear_table_cache()
    try:
        return [(r["i"], r["j"], r["cov"]) for r in embedding_covariance(spark, d).collect()]
    finally:
        clear_table_cache()


def _vec(seed, d=5):
    # deterministic float32 values, no randomness needed
    return [((seed * 31 + k * 17) % 97 - 48) / 16.0 for k in range(d)]


def test_uniform_triangle_path(spark, tmp_path):
    vecs = [(i, _vec(i), i % 3) for i in range(40)]
    assert _run(spark, _mk_sf_dir(tmp_path, vecs)) == _expected(vecs)


def test_uniform_with_empty_vector(spark, tmp_path):
    """A zero-length array must contribute nothing (the old join form
    produced no rows for it; sequence(0,-1) would descend)."""
    vecs = [(i, _vec(i), 0) for i in range(20)] + [(99, [], 0)]
    assert _run(spark, _mk_sf_dir(tmp_path, vecs)) == _expected(vecs)


def test_ragged_fallback_path(spark, tmp_path):
    """Ragged lengths: per-cell marginals are NOT per-index constants,
    so the full self-join fallback must run — and match the mirror."""
    vecs = [(i, _vec(i, d=3 + (i % 3)), 0) for i in range(24)]
    assert _run(spark, _mk_sf_dir(tmp_path, vecs)) == _expected(vecs)


def test_null_component_fallback_path(spark, tmp_path):
    """A NULL component forces the fallback; NULL products vanish from
    every sum on both engines (sum skips NULL)."""
    base = [(i, _vec(i, d=4), 0) for i in range(20)]
    emb = _vec(999, d=4)
    emb[2] = None
    vecs = base + [(99, emb, 0)]
    assert _run(spark, _mk_sf_dir(tmp_path, vecs)) == _expected(vecs)
