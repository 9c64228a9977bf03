"""End-to-end curation pipeline in ONE Catalyst plan (SURVEY.md §2e
capstone): exact dedup (keep-first) → row-local quality filters →
eval-set decontamination → weighted selection.

This is the shape a production training-data refresh runs nightly,
composed from the same primitives the individual operators expose —
declared as one DataFrame expression so Catalyst sees the whole
pipeline: the quality predicates run in the same stage as the dedup
window's output, the decontamination join broadcasts the (tiny) eval
n-gram set, and the final weighted top-k is a TakeOrderedAndProject.
The oracle replays every stage as one SQL CTE chain with the exact
expressions the stage operators' own oracles use (textquality /
pipeline_ext / sampling_ext), so the full composition — not just the
parts — is value-verified cross-engine.

Shuffle census at 100 TB: one exchange on content_hash (dedup
window, uniform md5 keys), one (doc_id, ng) explode feeding a
broadcast join (eval sets are tiny by construction), one anti-join
back on doc_id, and a top-k merge of k×partitions rows.  Nothing
else; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import normalized_text, tokenize
from icechunk_spark.operators.pipeline_ext import DECON_K, EVAL_MAX_ID, _ngrams_col
from icechunk_spark.operators.sampling_ext import _HEX12_INT, aes_key_col
from icechunk_spark.operators.textquality import (
    MAX_DUP_BIGRAM_FRAC,
    MAX_MEAN_WORD_LEN,
    MAX_SYMBOL_RATIO,
    MIN_MEAN_WORD_LEN,
    _grams_col,
    _round4,
)

CURATE_K = 50


def curate_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]

    # stage 1: exact dedup, first doc_id per normalized-content hash
    first = (
        docs.withColumn("content_hash", F.md5(normalized_text(F.col("text"))))
        .withColumn(
            "first_id", F.min("doc_id").over(Window.partitionBy("content_hash"))
        )
        .filter(F.col("doc_id") == F.col("first_id"))
    )

    # stage 2: row-local Gopher-style quality predicates (the join-free
    # subset of gopher_quality_filters — identical expressions/rounding)
    toked = first.withColumn("toks", tokenize(F.lower(F.col("text"))))
    n_tok = F.size("toks").cast("double")
    # the threshold predicates compare 4-decimal roundings; _round4's
    # DECIMAL(24,8) cast makes a half-point landing (a function of the
    # data — new SFs re-roll the dice) round HALF_UP on both engines
    # instead of flipping a keep/drop cross-engine
    mean_wl = _round4(
        F.aggregate(
            F.col("toks"), F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n_tok
    )
    symbol_ratio = _round4(
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("double")
        / F.length("text").cast("double")
    )
    bigrams = _grams_col(F.col("toks"), 2)
    dup_bigram = _round4(
        F.coalesce(
            1.0
            - F.size(F.array_distinct(bigrams)).cast("double")
            / F.size(bigrams).cast("double"),
            F.lit(0.0),
        )
    )
    kept = toked.filter(
        (mean_wl >= MIN_MEAN_WORD_LEN)
        & (mean_wl <= MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= MAX_SYMBOL_RATIO)
        & (dup_bigram <= MAX_DUP_BIGRAM_FRAC)
        & (F.col("doc_id") >= EVAL_MAX_ID)  # train side only
    ).select("doc_id", "source", "n_chars", "text")
    # kept feeds BOTH the contamination explode and the anti-join left
    # side; without a persist the dedup window + quality predicates run
    # twice (the multi-consumer recompute trap, PLANS.md round-8 —
    # reuse=2 but the recompute includes the content_hash shuffle)
    kept = kept.persist()

    # stage 3: decontamination — drop docs sharing any DECON_K-gram
    # with the eval set (doc_id < EVAL_MAX_ID), broadcast eval grams
    eval_ngs = (
        docs.filter(F.col("doc_id") < EVAL_MAX_ID)
        .select(F.explode(_ngrams_col(F.col("text"), DECON_K)).alias("ng"))
        .distinct()
    )
    contaminated = (
        kept.select(
            "doc_id", F.explode(_ngrams_col(F.col("text"), DECON_K)).alias("ng")
        )
        .join(F.broadcast(eval_ngs), "ng")
        .select("doc_id")
        .distinct()
    )
    survivors = kept.join(contaminated, "doc_id", "left_anti")

    # stage 4: A-ES weighted selection of the curated pool (∝ n_chars)
    return (
        survivors.select("doc_id", "source", "n_chars", aes_key_col())
        .orderBy(F.desc("w_key"), "doc_id")
        .limit(CURATE_K)
    )


CURATE_SELECT_SQL = f"""
WITH norm AS (
  SELECT doc_id, source, n_chars, text,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM documents
), first AS (
  SELECT doc_id, source, n_chars, text
  FROM (SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS mn FROM norm)
  WHERE doc_id = mn
), tokd AS (
  SELECT doc_id, source, n_chars, text,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM first
), kept AS (
  SELECT doc_id, source, n_chars, text
  FROM tokd
  WHERE CAST(round(CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
              / len(toks) AS DECIMAL(24,8)), 4) AS DOUBLE) >= {MIN_MEAN_WORD_LEN}
    AND CAST(round(CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
              / len(toks) AS DECIMAL(24,8)), 4) AS DOUBLE) <= {MAX_MEAN_WORD_LEN}
    AND CAST(round(CAST(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
              / length(text) AS DECIMAL(24,8)), 4) AS DOUBLE) <= {MAX_SYMBOL_RATIO}
    AND CAST(round(CAST(COALESCE(1.0 - CAST(len(list_distinct(
          [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
        )) AS DOUBLE) / (len(toks) - 1), 0.0) AS DECIMAL(24,8)), 4) AS DOUBLE)
        <= {MAX_DUP_BIGRAM_FRAC}
    AND doc_id >= {EVAL_MAX_ID}
), raw_ngs AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{DECON_K - 1}], ' ')
                        FOR i IN range(1, len(toks) - {DECON_K - 2})]) AS ngs
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
), ev AS (
  SELECT DISTINCT unnest(ngs) AS ng FROM raw_ngs WHERE doc_id < {EVAL_MAX_ID}
), contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT r.doc_id, unnest(r.ngs) AS ng
        FROM raw_ngs r JOIN kept k ON r.doc_id = k.doc_id) g
  JOIN ev ON g.ng = ev.ng
), survivors AS (
  SELECT k.doc_id, k.source, k.n_chars FROM kept k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id, source, n_chars,
       CAST(round(CAST(ln(({_HEX12_INT} + 0.5) / {2**48}.0) / n_chars
                       AS DECIMAL(24,12)), 9) AS DOUBLE) AS w_key
FROM (SELECT doc_id, source, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS hh
      FROM survivors)
ORDER BY w_key DESC, doc_id
LIMIT {CURATE_K}
"""


QUERIES = {
    "curate_select": curate_select,
}

ORACLES = {
    "curate_select": CURATE_SELECT_SQL,
}
