"""percentiles r14 2nd pass: the counts+window two-phase form must be
BIT-identical to the percentile() aggregate form (same doubles before
the final round), on the real table and on synthetic shapes that
exercise exact-index hits (kl == kh), interpolated positions, repeated
values, and a group whose column is entirely NULL."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _canon(df):
    return [
        tuple(
            struct.pack("d", v) if isinstance(v, float) else v for v in row
        )
        for row in df.collect()
    ]


def test_twophase_equals_agg_on_lineitem(spark):
    from icechunk_spark.catalog import load_tables
    from icechunk_spark.operators import windows as W

    li = load_tables(spark, SF_DIR)["lineitem"]
    assert _canon(W._percentiles_agg(li)) == _canon(W._percentiles_twophase(li))


def test_group_percentiles_matches_percentile_builtin(spark):
    """Synthetic frame: repeated values, a two-row group (exact-index
    and interpolated positions), and an all-NULL group (the builtin
    returns NULL; the two-phase row vanishes and the full join
    NULL-fills)."""
    from icechunk_spark.engine import local_df
    from icechunk_spark.operators.windows import _group_percentiles

    rows = []
    for g, vals in (
        ("a", [1.25, 1.25, 2.5, 3.75, 100.0, 100.0, 7.0]),
        ("b", [42.0, -1.5]),
        ("c", [None, None]),
        ("d", [0.1]),
    ):
        rows += [{"g": g, "v": v} for v in vals]
    df = local_df(spark, rows, "g string, v double")

    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    names = [f"q{i}" for i in range(len(ps))]
    got = {
        r["g"]: tuple(r[nm] for nm in names)
        for r in _group_percentiles(df, "g", "v", ps, names).collect()
    }
    exp = {
        r["g"]: tuple(r[nm] for nm in names)
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {p!r})").alias(nm)
                for p, nm in zip(ps, names)
            ]
        )
        .collect()
        if any(r[nm] is not None for nm in names)
    }
    assert set(got) == set(exp)  # all-NULL group absent from both
    for g in exp:
        for x, y in zip(got[g], exp[g]):
            assert (x is None) == (y is None)
            if x is not None:
                assert struct.pack("d", x) == struct.pack("d", y), (g, x, y)


def test_dispatch_threshold(spark):
    """Small SFs must stay on the single-aggregate form."""
    import pyarrow.parquet as pq

    from icechunk_spark.catalog import table_parquet_files
    from icechunk_spark.operators.windows import PCTL_TWOPHASE_MIN_ROWS

    n = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in table_parquet_files(SF_DIR, "lineitem")
    )
    assert 0 < n < PCTL_TWOPHASE_MIN_ROWS
