"""Semantic invariants for the line/containment curation ops beyond
the oracle gate: internal consistency a value-hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.operators.linedup import (
    dedup_cascade,
    idf_doc_score,
    line_dedup,
    ngram_containment,
)

from .conftest import SF_DIR


def test_line_dedup_invariants(spark):
    rows = line_dedup(spark, SF_DIR).collect()
    assert rows, "corpus produced no lines"
    for r in rows:
        assert 0 < r.kept_lines <= r.n_lines or (r.kept_lines == 0 and r.n_lines > 0)
        assert 0.0 <= r.dup_line_frac <= 1.0
    # global conservation: kept lines across the corpus == distinct
    # line hashes (each distinct line is kept exactly once)
    df = line_dedup(spark, SF_DIR)
    total_kept = df.agg(F.sum("kept_lines")).collect()[0][0]
    from icechunk_spark.catalog import load_tables
    from icechunk_spark.functions import tokenize
    from icechunk_spark.operators.linedup import LINE_TOKENS

    t = load_tables(spark, SF_DIR)
    toks = tokenize(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    lines = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_distinct = (
        t["documents"]
        .select(F.explode(lines).alias("line"))
        .select(F.countDistinct("line"))
        .collect()[0][0]
    )
    assert total_kept == n_distinct


def test_cascade_keep_reason_consistency(spark):
    rows = dedup_cascade(spark, SF_DIR).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    # the smallest doc_id can never be dropped (no earlier doc exists)
    first = min(by_id)
    assert by_id[first].keep == 1 and by_id[first].reason is None
    for r in rows:
        assert (r.keep == 1) == (r.reason is None)
        if r.reason is not None:
            assert r.reason in ("exact", "ngram", "semantic")


def test_containment_is_directional_and_bounded(spark):
    rows = ngram_containment(spark, SF_DIR).collect()
    for r in rows:
        assert r.doc_a != r.doc_b
        assert 0.8 <= r.containment <= 1.0


def test_idf_bounds(spark):
    import math

    rows = idf_doc_score(spark, SF_DIR).collect()
    n_docs = len(rows)
    for r in rows:
        assert r.n_distinct_toks > 0
        # idf of any token is within [0, ln(N)]
        assert -1e-9 <= r.avg_idf <= math.log(n_docs) + 1e-9


def test_length_mad_approx_tracks_exact(spark):
    """The sketch variant's oracle-checked invariant vs the exact one
    (VERDICT r9 #5): discrete vs interpolated median differ by at most
    one inter-value gap, the MAD likewise, and the far-outlier flags
    agree — a doc > MAD_K*mad + one gap from the median is flagged by
    BOTH variants."""
    from icechunk_spark.operators.linedup import (
        length_mad_outliers,
        length_mad_outliers_approx,
    )

    exact = {r.source: r for r in length_mad_outliers(spark, SF_DIR).collect()}
    approx = {r.source: r for r in length_mad_outliers_approx(spark, SF_DIR).collect()}
    assert exact.keys() == approx.keys()
    for src, e in exact.items():
        a = approx[src]
        assert a.n_docs == e.n_docs
        # discrete median = lower of the two middle values: within the
        # largest observed deviation step of the interpolated median
        assert abs(a.med_chars - e.med_chars) <= max(1.0, e.mad_chars)
        assert abs(a.mad_chars - e.mad_chars) <= max(1.0, e.mad_chars)
        # outlier counts: identical thresholds up to the median shift
        assert abs(a.n_outliers - e.n_outliers) <= max(2, 0.02 * e.n_docs)
