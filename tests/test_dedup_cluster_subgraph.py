"""dedup_cluster scale-adaptive dispatch (r14): at
>= DEDUP_SUBGRAPH_MIN_DOCS documents the min-label rounds run over
pair-graph nodes only (singletons attach once at the end).  Pins that
both paths produce IDENTICAL labels and that the dispatch reads the
footer count."""

from __future__ import annotations

from .conftest import SF_DIR


def _labels(spark, monkeypatch, threshold):
    import icechunk_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "DEDUP_SUBGRAPH_MIN_DOCS", threshold)
    rows = dd.dedup_cluster(spark, SF_DIR).collect()
    return [(r["doc_id"], r["cluster_id"]) for r in rows]


def test_subgraph_path_equals_alldocs_path(spark, monkeypatch):
    all_docs = _labels(spark, monkeypatch, 1 << 60)  # force all-docs path
    spark.catalog.clearCache()
    subgraph = _labels(spark, monkeypatch, 0)  # force subgraph path
    assert all_docs == subgraph
    assert all_docs  # non-empty, ordered by doc_id
    assert all_docs == sorted(all_docs)


def test_dispatch_uses_footer_count(spark):
    """The testdata SFs sit below the threshold, so the registered
    query takes the all-docs path there; the footer helper must agree
    with the actual table size."""
    import icechunk_spark.operators.dedup as dd
    from icechunk_spark.catalog import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    n = dd._docs_rows(docs, SF_DIR)
    assert n == docs.count()
    assert n < dd.DEDUP_SUBGRAPH_MIN_DOCS
