"""Repetition-run detection (SURVEY.md §2d extension): the
"gibberish loop" filter an LLM corpus cleaning pass runs alongside
the Gopher mass ratios.  dup_bigram_frac measures GLOBAL duplicate
mass; a generation loop ("ha ha ha …", "la la la …") is a LOCAL
phenomenon — a long consecutive run — that global mass under-weights
in long documents, so corpus pipelines (Gopher §A.1.1, CCNet) filter
on maximum run length explicitly.

Two detectors per document, both exact:
- ``max_tok_run``: the longest consecutive run of one token
  (period-1 loops).
- ``max_alt_run``: the longest streak of positions where the token
  equals the token two back (period-2 loops, "a b a b a b" — which
  period-1 runs also satisfy from their third position).

Shape: one posexplode → two window passes PARTITIONED BY doc_id
(parallelism = #docs, the winnowing lesson) → gaps-and-islands
run-length via the lag/cumsum-of-changes idiom → one groupBy(doc_id).
All JVM expressions; one (doc_id) shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

LOOP_RUN_MIN = 5  # max_tok_run >= this flags a period-1 loop


def repetition_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.lower(F.col("text")))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # period-1: new island whenever the token changes
    grp1 = F.sum(
        (F.col("tok") != F.lag("tok").over(w)).cast("int")
    ).over(w)
    # period-2: a streak member when tok == tok two back; islands are
    # maximal such streaks (streak length k covers k+2 looped tokens)
    is2 = (F.col("tok") == F.lag("tok", 2).over(w)).cast("int")
    flagged = toks.select(
        "doc_id",
        "pos",
        F.coalesce(grp1, F.lit(0)).alias("g1"),
        F.coalesce(is2, F.lit(0)).alias("is2"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("pos")
    # islands of consecutive is2=1: island id = pos - running count of
    # is2 rows (constant within a consecutive streak)
    streak2 = flagged.withColumn(
        "g2", F.col("pos") - F.sum("is2").over(w2)
    )
    run1 = (
        flagged.groupBy("doc_id", "g1")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("doc_id")
        .agg(F.max("run").alias("max_tok_run"))
    )
    run2 = (
        streak2.filter(F.col("is2") == 1)
        .groupBy("doc_id", "g2")
        .agg(F.count(F.lit(1)).alias("streak"))
        .groupBy("doc_id")
        .agg((F.max("streak") + 2).alias("max_alt_run"))
    )
    return (
        docs.select("doc_id")
        .join(run1, "doc_id", "left")
        .join(run2, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("max_tok_run", F.lit(0)).cast("bigint").alias("max_tok_run"),
            F.coalesce("max_alt_run", F.lit(0)).cast("bigint").alias("max_alt_run"),
            (F.coalesce("max_tok_run", F.lit(0)) >= LOOP_RUN_MIN)
            .cast("int")
            .alias("is_loop"),
        )
        .orderBy("doc_id")
    )


REPETITION_RUNS_SQL = f"""
WITH toks AS (
  SELECT doc_id, pos - 1 AS pos, tok
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok,
               generate_subscripts(list_filter(string_split_regex(lower(text), '\\s+'),
                                               t -> t <> ''), 1) AS pos
        FROM documents)
), marked AS (
  SELECT doc_id, pos,
         COALESCE(CAST(tok <> lag(tok) OVER w AS INT), 0) AS chg,
         COALESCE(CAST(tok = lag(tok, 2) OVER w AS INT), 0) AS is2
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), grouped AS (
  SELECT doc_id, pos, is2,
         sum(chg) OVER (PARTITION BY doc_id ORDER BY pos) AS g1,
         pos - sum(is2) OVER (PARTITION BY doc_id ORDER BY pos) AS g2
  FROM marked
), run1 AS (
  SELECT doc_id, max(run) AS max_tok_run
  FROM (SELECT doc_id, g1, count(*) AS run FROM grouped GROUP BY doc_id, g1)
  GROUP BY doc_id
), run2 AS (
  SELECT doc_id, max(streak) + 2 AS max_alt_run
  FROM (SELECT doc_id, g2, count(*) AS streak
        FROM grouped WHERE is2 = 1 GROUP BY doc_id, g2)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(max_tok_run, 0) AS BIGINT) AS max_tok_run,
       CAST(COALESCE(max_alt_run, 0) AS BIGINT) AS max_alt_run,
       CAST(COALESCE(max_tok_run, 0) >= {LOOP_RUN_MIN} AS INT) AS is_loop
FROM documents d
LEFT JOIN run1 ON d.doc_id = run1.doc_id
LEFT JOIN run2 ON d.doc_id = run2.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "repetition_runs": repetition_runs,
}

ORACLES = {
    "repetition_runs": REPETITION_RUNS_SQL,
}
