"""Semantic invariants for the dataset-management operators
(split / packing / mixture) beyond oracle parity: conservation laws
and plan shape (all three must stay JVM-side — they run over every
document in the corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize
from icechunk_spark.operators.pipeline_ext import (
    DECON_K,
    EVAL_MAX_ID,
    PACK_BUDGET,
    decontaminate,
    mixture_sample,
    pack_sequences,
    split_train_val,
)

from .conftest import SF_DIR
from .test_plans import plan_of


def test_split_is_total_and_stable(spark):
    rows = split_train_val(spark, SF_DIR).collect()
    n_docs = load_tables(spark, SF_DIR)["documents"].count()
    assert len(rows) == n_docs  # every doc assigned exactly once
    assert {r["split"] for r in rows} <= {"train", "val"}
    # re-running yields the identical assignment (content-stable hash)
    again = {r["doc_id"]: r["split"] for r in split_train_val(spark, SF_DIR).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_packing_conserves_docs_and_tokens(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    total_docs = docs.count()
    total_toks = docs.select(
        F.sum(F.size(tokenize(F.col("text")))).alias("t")
    ).collect()[0]["t"]
    packs = pack_sequences(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in packs) == total_docs
    assert sum(r["pack_tokens"] for r in packs) == total_toks
    # pack ids are dense from 0 within each shard (offset cut points)
    by_shard: dict[int, list[int]] = {}
    for r in packs:
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))
    # a pack holds at least one doc and, beyond the first doc, starts
    # within budget of its offset boundary
    assert all(r["n_docs"] >= 1 for r in packs)
    assert PACK_BUDGET > 0


def test_mixture_keeps_within_source_totals(spark):
    rows = mixture_sample(spark, SF_DIR).collect()
    assert all(0 <= r["n_kept"] <= r["n_total"] for r in rows)
    # keep-all sources (src_num % 4 == 3) must keep every doc
    for r in rows:
        if int(r["source"][3:]) % 4 == 3:
            assert r["n_kept"] == r["n_total"], r


def test_decontaminate_covers_training_set_and_flags_eval_copies(spark):
    rows = decontaminate(spark, SF_DIR).collect()
    docs = load_tables(spark, SF_DIR)["documents"]
    n_train = docs.filter(F.col("doc_id") >= EVAL_MAX_ID).count()
    assert len(rows) == n_train  # every training doc gets a verdict
    assert all(r["contaminated"] == int(r["n_hits"] > 0) for r in rows)
    # a doc sharing no k-gram with eval must come back clean: a doc with
    # < DECON_K tokens has no k-grams at all, so n_hits must be 0
    short = {
        r["doc_id"]
        for r in docs.filter(
            (F.size(tokenize(F.col("text"))) < DECON_K)
            & (F.col("doc_id") >= EVAL_MAX_ID)
        )
        .select("doc_id")
        .collect()
    }
    for r in rows:
        if r["doc_id"] in short:
            assert r["n_hits"] == 0
    # the eval n-gram side must broadcast — the train scan is the only
    # shuffled side at 100 TB
    plan = plan_of(decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_pipeline_ops_stay_jvm_side(spark):
    for fn in (split_train_val, pack_sequences, mixture_sample, decontaminate):
        plan = plan_of(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{fn.__name__} fell back to Python rows"
