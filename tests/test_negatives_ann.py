"""hard_negative_mining_ann (r12): semantic invariants, the recall
contract vs the brute-force anchor, and plan hygiene (values are
oracle-checked by tools/check.py; the registered query's recall_ok
column IS the driver contract)."""

from __future__ import annotations

from icechunk_spark.operators.negatives import hard_negative_mining
from icechunk_spark.operators.negatives_ann import (
    HN_RECALL_TAU,
    hard_negative_mining_ann,
    hard_negative_mining_ann_neighbors,
)
from icechunk_spark.operators.similarity import N_QUERIES, TOP_K

from .conftest import SF_DIR


def test_ann_negatives_are_wrong_label_topk(spark):
    rows = hard_negative_mining_ann_neighbors(spark, SF_DIR).collect()
    assert rows
    per_query: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"], r
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rs in per_query.items():
        ordered = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in ordered] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in ordered]
        assert sims == sorted(sims, reverse=True), (q, sims)


def test_ann_recall_contract_clears_tau(spark):
    """Every query's recall@K vs the exact brute-force miner must
    clear HN_RECALL_TAU — the same invariant the driver oracle pins,
    re-derived here from the raw neighbor rows so a contract bug in
    hard_negative_mining_ann itself can't self-certify."""
    bf = {
        (r["query_id"], r["negative_id"])
        for r in hard_negative_mining(spark, SF_DIR).collect()
    }
    ann = {
        (r["query_id"], r["negative_id"])
        for r in hard_negative_mining_ann_neighbors(spark, SF_DIR).collect()
    }
    per_q: dict[int, list[int]] = {}
    for q, n in bf:
        hit_total = per_q.setdefault(q, [0, 0])
        hit_total[1] += 1
        hit_total[0] += (q, n) in ann
    assert len(per_q) == N_QUERIES
    for q, (hits, total) in per_q.items():
        assert hits / total >= HN_RECALL_TAU, (q, hits, total)
    contract = hard_negative_mining_ann(spark, SF_DIR).collect()
    assert len(contract) == N_QUERIES
    assert all(r["recall_ok"] for r in contract)
    assert all(r["k"] == TOP_K for r in contract)


def test_ann_plan_is_one_arrow_pass(spark):
    """Mining stage: ONE Arrow-batched MapInPandas over the corpus —
    no row-wise Python (BatchEvalPython), no nested loop over the
    corpus (the brute-force plan this op exists to avoid), and the
    global top-k window runs over the per-batch winners only."""
    df = hard_negative_mining_ann_neighbors(spark, SF_DIR)
    df.collect()  # AQE finalizes plans on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan, plan  # the AQE string repeats the node in the initial plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zero_footer_count_falls_back_to_spark_count(spark, monkeypatch):
    """A nested/partitioned layout lists zero parquet footers; that
    must read as UNKNOWN (→ Spark count), not as a 0-row corpus that
    disables the Lloyd training cap (ADVICE r12)."""
    import icechunk_spark.operators.negatives_ann as na
    from icechunk_spark.catalog import load_tables

    emb = load_tables(spark, SF_DIR)["embeddings"]
    true_n = emb.count()
    monkeypatch.setattr(na, "_table_rows_from_footer", lambda d, n: 0)
    assert na._corpus_rows(emb, SF_DIR) == true_n
    # and the footer path is untouched when it works
    monkeypatch.undo()
    assert na._corpus_rows(emb, SF_DIR) == true_n
