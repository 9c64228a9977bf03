"""BPE tokenization to token IDS (SURVEY.md §2e extension): the
tokenizer-APPLY capstone — train the K merges over the corpus
(bpetrain's greedy algebra), then segment the first SEG_DOCS
documents into actual token-id sequences, the array a training
pipeline feeds to sequence packing.  ``bpe_encode_corpus`` proves the
segmentation statistics; THIS op emits the ids.

Id assignment (the determinism contract): vocabulary = the corpus's
distinct word characters ∪ the K merged symbols, ids = 1-based rank
in lexicographic order — pure set algebra both engines reproduce.

Scale shape: ONE corpus tokenize+groupBy builds the word-count frame
(feeds training AND the distinct-char vocab — both vocabulary-sized
follow-ups); segmentation runs on the DISTINCT words of the selected
docs only (the merge chain is K chained JVM replaces — bpeencode's
joinless shape), rejoined to the doc word stream by word; the symbol
→ id map is a ~(alphabet + K)-entry literal map evaluated JVM-side.
At 100 TB the same plan segments every doc: the only driver state is
the merge table and the id map.

Oracle: full replay — the K-step merge chain regenerated as DuckDB
CTEs (carrying ``word`` through, unlike the trainer's (wc, s) chain),
the same char∪merged vocabulary ranked by ORDER BY sym, ids
reassembled per document with list(id ORDER BY word-pos, sym-pos)
(value-hash compares the arrays element-wise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize
from icechunk_spark.operators.bpetrain import (
    BOUND,
    N_MERGES,
    SEP,
    train_merges_from_word_counts,
)
from icechunk_spark.operators.dedup import duck_toks

SEG_DOCS = 20  # doc_id < SEG_DOCS are segmented


def bpe_segment_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(F.explode(tokenize(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = train_merges_from_word_counts(spark, words).collect()
    # vocabulary: distinct corpus word chars ∪ merged symbols, ranked
    chars = (
        words.select(F.explode(F.split("word", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    vocab = sorted({r["ch"] for r in chars} | {m["merged"] for m in merges})
    id_map = F.create_map(
        *[F.lit(x) for sym, i in zip(vocab, range(1, len(vocab) + 1)) for x in (sym, i)]
    )

    sel = docs.filter(F.col("doc_id") < SEG_DOCS).select(
        "doc_id", F.posexplode(tokenize(F.lower(F.col("text")))).alias("wpos", "word")
    )
    wds = sel.select("word").distinct().withColumn(
        "s",
        F.concat(F.lit(BOUND), F.array_join(F.split("word", ""), BOUND), F.lit(BOUND)),
    )
    for m in merges:
        wds = wds.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(SEP + m["lhs"] + BOUND + m["rhs"] + SEP),
                F.lit(SEP + m["merged"] + SEP),
            ),
        )
    wds = wds.select(
        "word", F.filter(F.split("s", BOUND), lambda x: x != "").alias("syms")
    )
    rows = (
        sel.join(wds, "word")
        .select("doc_id", "wpos", F.posexplode("syms").alias("spos", "sym"))
        .withColumn("id", id_map[F.col("sym")].cast("int"))
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # Rendered as a comma-joined string (the session_paths corpus
            # convention): the driver's pandas canonicalizer sorts on every
            # output column and a raw array<int> is unhashable there.  The
            # array semantics stay pinned by the losslessness test, which
            # splits this back into ids.
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "spos", "id"))),
                    lambda t: t["id"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
        .orderBy("doc_id")
    )


def _segment_chain_sql(k: int = N_MERGES) -> str:
    """The trainer's K-step chain regenerated CARRYING ``word`` (the
    (wc, s)-only chain in bpetrain._bpe_oracle_sql can train but not
    map words back to segmentations)."""
    toks = duck_toks("lower(text)")
    parts = [
        f"""WITH words AS (
  SELECT tok AS word, count(*) AS wc
  FROM (SELECT unnest({toks}) AS tok FROM documents)
  GROUP BY tok
), s0 AS MATERIALIZED (
  SELECT word, wc,
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
  SELECT a AS lhs, b AS rhs, a || b AS merged FROM p{i} ORDER BY c DESC, a, b LIMIT 1
), s{i} AS MATERIALIZED (
  SELECT word, wc,
         replace(s, '{SEP}' || m.lhs || '{BOUND}' || m.rhs || '{SEP}',
                    '{SEP}' || m.merged || '{SEP}') AS s
  FROM s{i - 1}, m{i} m
)"""
        )
    return "".join(parts)


def _segment_ids_sql(k: int = N_MERGES) -> str:
    toks = duck_toks("lower(text)")
    merged_union = "\n  UNION\n  ".join(
        f"SELECT merged AS sym FROM m{i}" for i in range(1, k + 1)
    )
    return f"""{_segment_chain_sql(k)}, chars AS (
  SELECT DISTINCT ch AS sym
  FROM (SELECT unnest(string_split(word, '')) AS ch FROM words)
  WHERE ch <> ''
), vsyms AS (
  SELECT sym FROM chars
  UNION
  {merged_union}
), vocab AS (
  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS INT) AS id FROM vsyms
), docw AS (
  SELECT doc_id, unnest({toks}) AS word, generate_subscripts({toks}, 1) AS wpos
  FROM documents WHERE doc_id < {SEG_DOCS}
), segd AS (
  SELECT d.doc_id, d.wpos,
         list_filter(string_split(s.s, '{BOUND}'), x -> x <> '') AS syms
  FROM docw d JOIN s{k} s ON s.word = d.word
), symrows AS (
  SELECT doc_id, wpos, unnest(syms) AS sym, generate_subscripts(syms, 1) AS spos
  FROM segd
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       array_to_string(list(v.id ORDER BY wpos, spos), ',') AS token_ids
FROM symrows JOIN vocab v USING (sym)
GROUP BY doc_id
ORDER BY doc_id
"""


BPE_SEGMENT_SQL = _segment_ids_sql()

QUERIES = {"bpe_segment_ids": bpe_segment_ids}
ORACLES = {"bpe_segment_ids": BPE_SEGMENT_SQL}
