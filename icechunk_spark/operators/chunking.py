"""Context-window chunking census (SURVEY.md §2e extension): the
pretraining step that splits documents into fixed token windows with a
stride overlap (GPT-style block packing with overlap; cf. reference
test coverage of slice/window reads, icechunk-python tests/test_store
slicing semantics — here re-expressed over text).

Every document is cut into windows of ``CHUNK_W`` tokens advancing by
``CHUNK_S`` (overlap = W - S); the final window is short and padded to
W at training time.  The census a pipeline runs before materializing
shards:

- how many chunks the corpus yields per source,
- the pad waste (tokens of padding in final windows),
- chunk-level duplication (distinct chunk fingerprints vs total) —
  the overlap + boilerplate signal that motivates chunk-level dedup.

Shape at 100 TB: one documents scan, one explode whose fan-out is
~tokens/S per doc (bounded, data-proportional), ONE groupBy(source)
with map-side partial aggregation (distinct fingerprints two-phase on
(source, fp)).  All JVM expressions — tokenize/slice/md5 run inside
whole-stage codegen; no Python, no joins, no windows.

Ratio parity: every reported ratio is a ratio of exact BIGINTs,
rounded half-up in pure integer arithmetic (m4 = (2*10^4*num + den)
div (2*den)) — the recorded cross-engine half-point lesson.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

CHUNK_W = 64  # window length in tokens
CHUNK_S = 48  # stride (overlap = CHUNK_W - CHUNK_S)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select(
        "doc_id",
        "source",
        tokenize(F.lower(F.col("text"))).alias("toks"),
    ).withColumn("n", F.size("toks"))
    # n <= W -> one chunk; else ceil((n-W)/S) + 1 final-inclusive windows
    chunked = toked.withColumn(
        "n_chunks",
        F.when(F.col("n") <= CHUNK_W, F.lit(1)).otherwise(
            F.expr(f"(n - {CHUNK_W} + {CHUNK_S} - 1) div {CHUNK_S}") + F.lit(1)
        ),
    )
    # toks rides through the explode (fan-out ~n/S per doc) — a
    # re-join on doc_id to fetch the array back would be a shuffle
    chunks = chunked.select(
        "doc_id",
        "source",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("idx"),
    ).select(
        "doc_id",
        "source",
        "toks",
        (F.col("idx") * CHUNK_S).alias("start"),
        F.least(F.lit(CHUNK_W), F.col("n") - F.col("idx") * CHUNK_S).alias("len"),
    )
    fps = chunks.select(
        "source",
        "doc_id",
        "len",
        F.md5(
            F.array_join(F.expr("slice(toks, start + 1, len)"), " ")
        ).alias("fp"),
    )
    agg = fps.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("fp").alias("distinct_chunks"),
        F.sum(F.lit(CHUNK_W) - F.col("len")).alias("pad_tokens"),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.col("distinct_chunks").cast("bigint").alias("distinct_chunks"),
        F.col("pad_tokens").cast("bigint").alias("pad_tokens"),
        (
            F.expr("(20000 * n_chunks + n_docs) div (2 * n_docs)") / 10000.0
        ).alias("chunks_per_doc"),
        (
            F.expr(
                "(20000 * (n_chunks - distinct_chunks) + n_chunks) div (2 * n_chunks)"
            )
            / 10000.0
        ).alias("dup_chunk_frac"),
        (
            F.expr(
                f"(20000 * pad_tokens + n_chunks * {CHUNK_W}) div (2 * n_chunks * {CHUNK_W})"
            )
            / 10000.0
        ).alias("pad_frac"),
    ).orderBy("source")


CHUNK_DOCUMENTS_SQL = f"""
WITH toked AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, source, toks, len(toks) AS n,
         CASE WHEN len(toks) <= {CHUNK_W} THEN 1
              ELSE (len(toks) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} + 1
         END AS n_chunks
  FROM toked
), chunks AS (
  SELECT doc_id, source,
         idx * {CHUNK_S} AS start,
         least({CHUNK_W}, n - idx * {CHUNK_S}) AS len,
         md5(array_to_string(list_slice(toks, idx * {CHUNK_S} + 1,
                                        idx * {CHUNK_S} + least({CHUNK_W}, n - idx * {CHUNK_S})), ' ')) AS fp
  FROM sized, unnest(generate_series(0, n_chunks - 1)) AS t(idx)
), agg AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(DISTINCT fp) AS BIGINT) AS distinct_chunks,
         CAST(sum({CHUNK_W} - len) AS BIGINT) AS pad_tokens
  FROM chunks GROUP BY source
)
SELECT source, n_docs, n_chunks, distinct_chunks, pad_tokens,
       ((20000 * n_chunks + n_docs) // (2 * n_docs)) / 10000.0 AS chunks_per_doc,
       ((20000 * (n_chunks - distinct_chunks) + n_chunks) // (2 * n_chunks)) / 10000.0 AS dup_chunk_frac,
       ((20000 * pad_tokens + n_chunks * {CHUNK_W}) // (2 * n_chunks * {CHUNK_W})) / 10000.0 AS pad_frac
FROM agg
ORDER BY source
"""


QUERIES = {
    "chunk_documents": chunk_documents,
}

ORACLES = {
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
}
