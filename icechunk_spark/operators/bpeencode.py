"""BPE tokenizer APPLICATION (SURVEY.md §2e extension): encode the
corpus with the merges ``bpe_train_merges`` (bpetrain.py) trains, and
report per-source fertility — tokens per word and chars per token —
the numbers a pipeline checks before committing to a tokenizer (high
fertility on a language/source = that slice is expensive to train on
and under-represented per byte).

Scale shape (the production trick): ONE corpus scan builds the
per-(source, word) count frame; tokenizer training re-aggregates it to
per-word counts (identical to counting the corpus directly) and the
merge chain is applied RIGHT ON the (source, word) frame — still
vocabulary-sized (vocab x the handful of sources), with no
distinct-vocab shuffle and no vocab equi-join (the r10 shape paid
both; sf10 measured 7.5 s -> see BASELINE.md r11).  The merge table
reaches the driver as K=12 bounded rows (the FPS/MMR bounded-collect
precedent) and is applied as broadcast-literal string replaces — the
same double-separator greedy ``replace`` representation bpetrain.py
proves byte-identical across engines.

All outputs are BIGINT counts and integer-half-up 4dp ratios — no
float aggregation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.engine import local_df
from icechunk_spark.functions import tokenize
from icechunk_spark.operators.bpetrain import (
    BOUND,
    N_MERGES,
    SEP,
    train_merges_from_word_counts,
)
from icechunk_spark.operators.dedup import duck_toks


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source",
        F.explode(tokenize(F.lower(F.col("text")))).alias("word"),
    )
    # ONE corpus scan: the per-(source, word) counts feed BOTH the
    # tokenizer training (second-stage re-aggregation to per-word
    # counts — identical to counting the corpus directly) and the
    # encode, so the query never explodes the token stream twice
    # persisted for the duration of this call (training + encode both
    # read it) and unpersisted in the finally below (ADVICE r11: the
    # lazy-return version leaked the cache in long-lived sessions)
    ws = (
        toks.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    try:
        word_counts = ws.groupBy("word").agg(F.sum("cnt").alias("wc"))
        # K bounded merge rows on the driver — the tokenizer artifact
        merges = train_merges_from_word_counts(spark, word_counts).collect()

        # the (source, word) count frame is still vocabulary-sized (vocab
        # x the handful of sources), so the merge chain runs RIGHT ON IT:
        # one projection of K chained JVM replaces, no distinct-vocab
        # shuffle and no vocab equi-join (the r10 shape paid both — the
        # join was the encode side's largest exchange; measured at sf10 in
        # BASELINE.md r11)
        enc = (
            ws
            .select(
                "source",
                "word",
                "cnt",
                F.concat(
                    F.lit(BOUND), F.array_join(F.split("word", ""), BOUND), F.lit(BOUND)
                ).alias("s"),
            )
        )
        for m in merges:
            enc = enc.select(
                "source",
                "word",
                "cnt",
                F.replace(
                    F.col("s"),
                    F.lit(SEP + m["lhs"] + BOUND + m["rhs"] + SEP),
                    F.lit(SEP + m["merged"] + SEP),
                ).alias("s"),
            )
        enc = enc.select(
            "source",
            "cnt",
            F.length("word").alias("wlen"),
            F.size(F.filter(F.split("s", BOUND), lambda x: x != "")).alias("n_sym"),
        )
        agg = enc.groupBy("source").agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sym")).cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("wlen")).cast("bigint").alias("n_chars"),
        )
        rows = (
            agg.select(
                "source",
                "n_words",
                "n_tokens",
                (
                    F.expr("(20000 * n_tokens + n_words) div (2 * n_words)") / 10000.0
                ).alias("fertility"),
                (
                    F.expr("(20000 * n_chars + n_tokens) div (2 * n_tokens)") / 10000.0
                ).alias("chars_per_token"),
            )
            .orderBy("source")
            .collect()
        )
    finally:
        ws.unpersist()
    return local_df(
        spark,
        rows,
        "source string, n_words bigint, n_tokens bigint, "
        "fertility double, chars_per_token double",
    ).orderBy("source")


def _merge_chain_sql(k: int = N_MERGES) -> str:
    """s0..s{k} + m1..m{k} CTEs — the identical per-step algebra as
    bpetrain._bpe_oracle_sql (bpetrain.py:138), regenerated here so
    the modules stay independent for staleness tracking.  MATERIALIZED
    throughout: the default CTE inlining doubles the plan per step."""
    toks = duck_toks("lower(text)")
    parts = [
        f"""WITH words AS (
  SELECT tok AS word, count(*) AS wc
  FROM (SELECT unnest({toks}) AS tok FROM documents)
  GROUP BY tok
), s0 AS MATERIALIZED (
  SELECT wc,
         '{BOUND}' || array_to_string(string_split(word, ''), '{BOUND}') || '{BOUND}' AS s
  FROM words
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", sy{i} AS MATERIALIZED (
  SELECT wc, list_filter(string_split(s, '{BOUND}'), x -> x <> '') AS syms FROM s{i - 1}
), p{i} AS MATERIALIZED (
  SELECT z[1] AS a, z[2] AS b, CAST(sum(wc) AS BIGINT) AS c
  FROM (SELECT wc, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS z
        FROM sy{i} WHERE len(syms) >= 2)
  GROUP BY z[1], z[2]
), m{i} AS MATERIALIZED (
  SELECT {i} AS step, a AS lhs, b AS rhs, a || b AS merged, c AS pair_count
  FROM p{i} ORDER BY c DESC, a, b LIMIT 1
), s{i} AS MATERIALIZED (
  SELECT wc,
         replace(s, '{SEP}' || m.lhs || '{BOUND}' || m.rhs || '{SEP}',
                    '{SEP}' || m.merged || '{SEP}') AS s
  FROM s{i - 1}, m{i} m
)"""
        )
    return "".join(parts)


def _encode_sql(k: int = N_MERGES) -> str:
    toks = duck_toks("lower(text)")
    return (
        _merge_chain_sql(k)
        + f""", enc AS MATERIALIZED (
  SELECT replace(s, '{SEP}', '') AS word,
         len(list_filter(string_split(s, '{BOUND}'), x -> x <> '')) AS n_sym
  FROM s{k}
), ws AS (
  SELECT source, tok AS word, count(*) AS cnt
  FROM (SELECT source, unnest({toks}) AS tok FROM documents)
  GROUP BY 1, 2
), agg AS (
  SELECT source,
         CAST(sum(cnt) AS BIGINT) AS n_words,
         CAST(sum(cnt * n_sym) AS BIGINT) AS n_tokens,
         CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars
  FROM ws JOIN enc USING (word)
  GROUP BY 1
)
SELECT source, n_words, n_tokens,
       ((20000 * n_tokens + n_words) // (2 * n_words)) / 10000.0 AS fertility,
       ((20000 * n_chars + n_tokens) // (2 * n_tokens)) / 10000.0 AS chars_per_token
FROM agg ORDER BY source
"""
    )


BPE_ENCODE_SQL = _encode_sql()

QUERIES = {
    "bpe_encode_corpus": bpe_encode_corpus,
}

ORACLES = {
    "bpe_encode_corpus": BPE_ENCODE_SQL,
}
