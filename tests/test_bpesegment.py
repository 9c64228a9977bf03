"""bpe_segment_ids (r12): the id sequences must LOSSLESSLY encode the
tokenized text — detokenizing through the vocabulary reproduces every
document's exact character stream (values are oracle-checked by
tools/check.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize
from icechunk_spark.operators.bpesegment import SEG_DOCS, bpe_segment_ids
from icechunk_spark.operators.bpetrain import train_merges_from_word_counts

from .conftest import SF_DIR


def test_segment_ids_detokenize_losslessly(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    words = (
        docs.select(F.explode(tokenize(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = train_merges_from_word_counts(spark, words).collect()
    chars = (
        words.select(F.explode(F.split("word", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    vocab = sorted({r["ch"] for r in chars} | {m["merged"] for m in merges})
    sym_of = {i + 1: s for i, s in enumerate(vocab)}

    out = bpe_segment_ids(spark, SF_DIR).collect()
    assert out and len(out) <= SEG_DOCS
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id") < SEG_DOCS).collect()
    }
    for r in out:
        # registered shape is the comma-joined rendering (driver
        # canonicalizer convention); split it back to real ids here
        ids = [int(x) for x in r["token_ids"].split(",")]
        assert r["n_tokens"] == len(ids) > 0
        assert all(1 <= i <= len(vocab) for i in ids)
        detok = "".join(sym_of[i] for i in ids)
        expected = "".join(texts[r["doc_id"]].lower().split())
        assert detok == expected, r["doc_id"]
    # merges actually fire: fewer tokens than characters overall
    assert sum(r["n_tokens"] for r in out) < sum(
        len("".join(t.lower().split())) for t in texts.values()
    )
