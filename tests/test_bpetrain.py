"""Distributed BPE training: the oracle checks Spark-vs-DuckDB
agreement; this test checks BOTH against an independent pure-Python
reference (the classic get-stats/merge loop over a word-count dict),
so a representation bug shared by the two engines' string-replace
encoding cannot hide."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.bpetrain import N_MERGES, bpe_train_merges

from .conftest import SF_DIR


def _reference_bpe(word_counts: dict[str, int], k: int) -> list[tuple]:
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, k + 1):
        stats: Counter = Counter()
        for w, syms in vocab.items():
            wc = word_counts[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc
        if not stats:
            break
        # count DESC, then (lhs, rhs) ASC — the operators' tie-break
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_pure_python_reference(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    wc = {
        r.word: r.n
        for r in docs.select(
            F.explode(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expected = _reference_bpe(wc, N_MERGES)
    got = [tuple(r) for r in bpe_train_merges(spark, SF_DIR).collect()]
    assert got == expected
    assert len(got) == N_MERGES


def test_bpe_greedy_overlap_rule(spark):
    """'aaa' under merge (a,a) must yield [aa, a] — the left-to-right
    non-overlap rule the double-separator replace encodes."""
    from icechunk_spark.operators.bpetrain import BOUND, SEP

    df = spark.createDataFrame(
        [(BOUND + BOUND.join(list("aaa")) + BOUND,)], "s string"
    )
    out = df.select(
        F.replace(
            F.col("s"), F.lit(SEP + "a" + BOUND + "a" + SEP), F.lit(SEP + "aa" + SEP)
        ).alias("s")
    ).collect()[0].s
    syms = [x for x in out.split(BOUND) if x]
    assert syms == ["aa", "a"]


def test_distributed_fallback_matches_driver_path(spark, monkeypatch):
    """Past VOCAB_COLLECT_CAP the per-step distributed loop takes over
    — it must produce the identical merge table (it no longer runs by
    default, so pin it against the driver-side path explicitly)."""
    import icechunk_spark.operators.bpetrain as bt

    fast = [tuple(r) for r in bpe_train_merges(spark, SF_DIR).collect()]
    monkeypatch.setattr(bt, "VOCAB_COLLECT_CAP", 0)
    slow = [tuple(r) for r in bpe_train_merges(spark, SF_DIR).collect()]
    assert fast == slow and len(fast) == N_MERGES
