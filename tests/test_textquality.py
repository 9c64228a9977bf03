"""Semantic invariants for the corpus-quality operators beyond oracle
parity: coverage totals, bounded ratios, and plan shape (everything
stays JVM-side; the only broadcast is the 1-row corpus-size scalar)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.textquality import (
    SPAN_K,
    TFIDF_TOP,
    dup_span_fraction,
    gopher_quality_filters,
    tfidf_top_terms,
)

from .conftest import SF_DIR
from .test_plans import plan_of


def test_dup_span_covers_all_docs_with_bounded_fraction(spark):
    rows = dup_span_fraction(spark, SF_DIR).collect()
    n_docs = load_tables(spark, SF_DIR)["documents"].count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_grams"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
    # gram totals: a doc with T tokens has max(T - SPAN_K + 1, 0) grams
    toks = load_tables(spark, SF_DIR)["documents"].select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t"),
    )
    expect = {
        r["doc_id"]: max(r["t"] - SPAN_K + 1, 0) for r in toks.collect()
    }
    for r in rows:
        assert r["n_grams"] == expect[r["doc_id"]]


def test_gopher_filters_split_and_agree_with_flags(spark):
    rows = gopher_quality_filters(spark, SF_DIR).collect()
    keeps = {r["keep"] for r in rows}
    assert keeps == {0, 1}  # thresholds actually discriminate
    for r in rows:
        assert 0.0 <= r["top_token_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        assert 0.0 <= r["symbol_ratio"] <= 1.0


def test_tfidf_returns_topk_per_doc_ranked(spark):
    rows = tfidf_top_terms(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = load_tables(spark, SF_DIR)["documents"].count()
    assert len(by_doc) == n_docs
    for recs in by_doc.values():
        recs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in recs] == list(range(1, len(recs) + 1))
        assert len(recs) <= TFIDF_TOP
        # ranks are ordered by non-increasing tfidf
        assert all(
            recs[i]["tfidf"] >= recs[i + 1]["tfidf"] for i in range(len(recs) - 1)
        )


def test_textquality_plans_stay_jvm_side(spark):
    for fn in (dup_span_fraction, gopher_quality_filters, tfidf_top_terms):
        plan = plan_of(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{fn.__name__} fell back to Python rows"
