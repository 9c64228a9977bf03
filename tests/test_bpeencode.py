"""bpe_encode_corpus: independent pure-Python fertility reference +
plan/shape pins.  The oracle checks Spark-vs-DuckDB; this pins both
against the classic sequential merge-application, so a shared
representation bug in the double-separator replace encoding cannot
hide (same strategy as test_bpetrain)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from icechunk_spark.operators.bpeencode import bpe_encode_corpus
from icechunk_spark.operators.bpetrain import N_MERGES

from .conftest import SF_DIR
from .test_bpetrain import _reference_bpe


def _apply_merges(word: str, merges: list[tuple]) -> int:
    syms = list(word)
    for _, a, b, _, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_fertility_matches_pure_python_reference(spark):
    rows = duckdb.sql(
        f"SELECT source, lower(text) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    wc: Counter = Counter()
    per_src = defaultdict(Counter)
    for src, text in rows:
        for w in text.split():
            if w:
                wc[w] += 1
                per_src[src][w] += 1
    merges = _reference_bpe(dict(wc), N_MERGES)
    n_sym = {w: _apply_merges(w, merges) for w in wc}
    got = {r["source"]: r for r in bpe_encode_corpus(spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, counts in per_src.items():
        n_words = sum(counts.values())
        n_tokens = sum(c * n_sym[w] for w, c in counts.items())
        n_chars = sum(c * len(w) for w, c in counts.items())
        r = got[src]
        assert r["n_words"] == n_words
        assert r["n_tokens"] == n_tokens
        assert (
            r["fertility"]
            == ((20000 * n_tokens + n_words) // (2 * n_words)) / 10000.0
        )
        assert (
            r["chars_per_token"]
            == ((20000 * n_chars + n_tokens) // (2 * n_tokens)) / 10000.0
        )
        # merging can only shorten: 1 <= n_sym <= len(word)
        assert n_words <= r["n_tokens"] <= n_chars


def test_encode_plan_stays_jvm(spark):
    df = bpe_encode_corpus(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
