"""Persisted-index incremental dedup (VERDICT r9 #3): the nightly
probe must be a pure function of (index tables, increment) — the
corpus is scanned at BUILD time only — and the index must be reused
across probes.  Oracle correctness is covered by the registered
``incremental_dedup_indexed`` query; these tests pin the structural
properties the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.incremental import (
    EXISTING_MOD,
    SPLIT_MOD,
    build_dedup_index,
    incremental_dedup_indexed,
    probe_dedup_index,
)

from .conftest import SF_DIR


def test_probe_plan_reads_only_index_and_increment(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    is_ex = (F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD
    db = build_dedup_index(spark, docs.filter(is_ex), db_hint="plan-test")
    out = probe_dedup_index(spark, db, docs.filter(~is_ex))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probe reads the index tables, not a corpus recompute
    assert "dedup_idx" in plan
    # every documents scan carries the INCREMENT filter (% 10 >= 7);
    # a corpus recompute would scan the existing side (% 10 < 7)
    assert "% 10) < 7" not in plan
    assert "% 10) >= 7" in plan
    # and the increment is scanned+shingled once, then served from cache
    assert "InMemoryTableScan" in plan


def test_index_build_is_idempotent_per_session(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    ex = docs.filter((F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD)
    db1 = build_dedup_index(spark, ex, db_hint="idem-test")
    db2 = build_dedup_index(spark, ex, db_hint="idem-test")
    assert db1 == db2
    assert spark.catalog.tableExists(f"{db1}.postings")
    assert spark.catalog.tableExists(f"{db1}.hash_index")


def test_hot_shingles_leave_the_index(spark):
    """No shingle in postings may exceed the df cap — the bound that
    keeps probe fan-out O(CAP) per increment shingle."""
    from icechunk_spark.operators.dedup import NGRAM_DF_CAP

    docs = load_tables(spark, SF_DIR)["documents"]
    ex = docs.filter((F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD)
    db = build_dedup_index(spark, ex, db_hint="cap-test")
    max_df = (
        spark.table(f"{db}.postings")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert max_df is not None and max_df <= NGRAM_DF_CAP


def test_indexed_query_matches_exact_tier_of_plain(spark):
    """The exact (hash) tier is cap-independent, so it must agree
    between the recompute and the indexed variants row for row."""
    from icechunk_spark.operators.incremental import incremental_dedup

    plain = {
        r.doc_id: r.duplicate_of
        for r in incremental_dedup(spark, SF_DIR).collect()
        if r.dup_kind == "exact"
    }
    indexed = {
        r.doc_id: r.duplicate_of
        for r in incremental_dedup_indexed(spark, SF_DIR).collect()
        if r.dup_kind == "exact"
    }
    assert plain == indexed
