"""chunk_documents: pure-Python reference census + plan pins."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from icechunk_spark.operators.chunking import CHUNK_S, CHUNK_W, chunk_documents

from .conftest import SF_DIR


def _py_census(rows):
    per_src = defaultdict(lambda: {"docs": set(), "chunks": 0, "fps": set(), "pad": 0})
    for doc_id, source, text in rows:
        toks = [t for t in text.lower().split() if t]
        n = len(toks)
        if n <= CHUNK_W:
            n_chunks = 1
        else:
            n_chunks = (n - CHUNK_W + CHUNK_S - 1) // CHUNK_S + 1
        s = per_src[source]
        s["docs"].add(doc_id)
        for idx in range(n_chunks):
            start = idx * CHUNK_S
            length = min(CHUNK_W, n - start)
            s["chunks"] += 1
            s["pad"] += CHUNK_W - length
            s["fps"].add(
                hashlib.md5(" ".join(toks[start : start + length]).encode()).hexdigest()
            )
    return per_src


def test_chunk_documents_matches_python_reference(spark):
    got = {r["source"]: r for r in chunk_documents(spark, SF_DIR).collect()}
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    ref = _py_census(rows)
    assert set(got) == set(ref)
    for src, s in ref.items():
        r = got[src]
        assert r["n_docs"] == len(s["docs"])
        assert r["n_chunks"] == s["chunks"]
        assert r["distinct_chunks"] == len(s["fps"])
        assert r["pad_tokens"] == s["pad"]
        # ratios: integer half-up 4dp
        m4 = (20000 * s["chunks"] + len(s["docs"])) // (2 * len(s["docs"]))
        assert r["chunks_per_doc"] == m4 / 10000.0


def test_chunk_documents_plan_is_joinless_single_agg(spark):
    df = chunk_documents(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # toks rides through the explode: no join anywhere in the plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, f"unexpected {j} — the doc_id re-join regressed"
    # census is one aggregation over the chunk rows (partial+final pairs
    # for count/sum plus the two-phase distinct expansions)
    assert "partial_" in plan.lower() or "HashAggregate" in plan
