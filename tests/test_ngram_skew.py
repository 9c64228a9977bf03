"""Hot-shingle skew cap for ngram_jaccard: an adversarial corpus where
one boilerplate shingle appears in every document must not blow up the
candidate join, and the capped-universe Jaccard must match a plain
Python reference."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from icechunk_spark.operators.dedup import ngram_jaccard_pairs


def _docs_df(spark, docs: dict[int, set[str]]):
    rows = [(i, sorted(sh)) for i, sh in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, sh array<string>")


def _reference_pairs(docs: dict[int, set[str]], df_cap: int, threshold: float = 0.5):
    df_count: dict[str, int] = {}
    for sh in docs.values():
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    capped = {i: {s for s in sh if df_count[s] <= df_cap} for i, sh in docs.items()}
    out = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(capped[a] & capped[b])
        union = len(capped[a] | capped[b])
        if union and inter / union >= threshold:
            out[(a, b)] = round(inter / union, 3)
    return out


def test_hot_shingle_capped_join_and_exact_values(spark):
    # 40 docs all sharing the shingle "the same boilerplate"; docs 2k
    # and 2k+1 additionally share two private shingles -> near-dups
    docs: dict[int, set[str]] = {}
    for k in range(20):
        base = {f"private {2 * k} a", f"private {2 * k} b"}
        docs[2 * k] = {"the same boilerplate"} | base | {f"only {2 * k}"}
        docs[2 * k + 1] = {"the same boilerplate"} | base | {f"only {2 * k + 1}"}
    df = _docs_df(spark, docs)

    capped = ngram_jaccard_pairs(df, df_cap=10)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    assert got == _reference_pairs(docs, df_cap=10)
    # exactly the 20 sibling pairs: the boilerplate shingle, shared by
    # all 40 docs, no longer connects unrelated documents
    assert len(got) == 20

    # without the cap the hot shingle drags every doc pair through the
    # join: candidate blow-up is the thing the cap prevents
    uncapped = ngram_jaccard_pairs(df, df_cap=10**9)
    assert uncapped.count() >= 20  # values differ (uncapped universe)


def test_cap_noop_when_nothing_hot(spark):
    docs = {
        1: {"a b c", "b c d"},
        2: {"a b c", "b c d"},
        3: {"x y z"},
    }
    df = _docs_df(spark, docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, df_cap=100).collect()
    }
    assert got == {(1, 2): 1.0}
