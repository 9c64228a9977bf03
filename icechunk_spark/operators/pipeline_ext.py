"""Training-pipeline dataset-management operators (SURVEY.md §2e
extension): deterministic train/val splitting, offset-based sequence
packing into fixed token budgets, and domain-mixture downsampling.

These are the dataset-engineering steps a 100 TB pretraining pipeline
runs after cleaning/dedup: assign every document to a split with a
content-stable hash (no RNG — reproducible across runs and engines),
pack documents into context-window-sized shards, and rebalance the
source mixture to target weights.

All hashing is md5 over the stringified doc_id so Spark and the
DuckDB oracle agree bit-for-bit; hex-prefix string comparison turns
the hash into a uniform keep/assign decision without any integer
conversion (lexicographic order on fixed-width hex == numeric order).

Scale notes (100 TB):
- split/mixture are stateless per-row filters — embarrassingly
  parallel, no shuffle at all; the only aggregation shuffles tiny
  (source / split) keys.
- packing windows partition by a shard key (doc_id % N_SHARDS), so
  the cumulative-sum window runs as N_SHARDS independent sorted
  streams instead of one global order-by — raise N_SHARDS with the
  cluster, each shard's pack ids stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, tokenize

# val if the first hex byte of md5(doc_id) sorts below '0d' → 13/256 ≈ 5.1%
VAL_THRESHOLD = "0d"
PACK_BUDGET = 2048  # tokens per packed training sequence
N_SHARDS = 32

_BUCKET = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
_TOK = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"


def _bucket_col():
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)


def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: stable under re-runs, insertions, and
    repartitioning (unlike randomSplit).  Pure row-local expression —
    zero shuffle (reference: random_split-style dataset ops done
    content-addressed instead)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .withColumn("bucket", _bucket_col())
        .withColumn(
            "split",
            F.when(F.col("bucket") < VAL_THRESHOLD, "val").otherwise("train"),
        )
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    )


SPLIT_SQL = f"""
SELECT doc_id, {_BUCKET} AS bucket,
       CASE WHEN {_BUCKET} < '{VAL_THRESHOLD}' THEN 'val' ELSE 'train' END AS split
FROM documents ORDER BY doc_id
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-based sequence packing: within each shard (doc_id %
    N_SHARDS), documents are laid out in doc_id order and cut into
    PACK_BUDGET-token packs at fixed token offsets (documents may
    straddle a boundary — the streaming-friendly layout used when the
    tokenizer concatenates with EOD separators).  Returns per-pack
    document and token counts."""
    t = load_tables(spark, sf_dir)
    docs = (
        t["documents"]
        .withColumn("shard", F.col("doc_id") % N_SHARDS)
        .withColumn("tok", F.size(tokenize(F.col("text"))).cast("bigint"))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = docs.withColumn(
        "pack_id", F.floor(F.coalesce(F.sum("tok").over(w), F.lit(0)) / PACK_BUDGET)
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("pack_tokens"),
        )
        .orderBy("shard", "pack_id")
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id % {N_SHARDS} AS shard, doc_id, {_TOK} AS tok
  FROM documents
), offs AS (
  SELECT shard, tok,
         CAST(floor(COALESCE(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_BUDGET}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT shard, pack_id, count(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS pack_tokens
FROM offs GROUP BY shard, pack_id ORDER BY shard, pack_id
"""


# target keep-fraction per source, derived from the source's numeric
# suffix: src_num % 4 → 25% / 50% / 75% / 100%.  'gg' sorts above any
# hex pair, so it keeps everything.
_FRAC_HEX = ("40", "80", "c0", "gg")


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample each source to a target
    weight with the same stable hash used for splitting, then report
    kept/total per source.  One conditional aggregate — the filter
    never materializes an intermediate table."""
    t = load_tables(spark, sf_dir)
    src_num = F.substring(F.col("source"), 4, 10).cast("int") % 4
    thr = (
        F.when(src_num == 0, _FRAC_HEX[0])
        .when(src_num == 1, _FRAC_HEX[1])
        .when(src_num == 2, _FRAC_HEX[2])
        .otherwise(_FRAC_HEX[3])
    )
    kept = (F.col("bucket") < thr).cast("bigint")
    return (
        t["documents"]
        .withColumn("bucket", _bucket_col())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).alias("n_kept"),
            F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


MIXTURE_SQL = f"""
WITH b AS (
  SELECT source, {_BUCKET} AS bucket,
         CASE CAST(substr(source, 4) AS INT) % 4
           WHEN 0 THEN '{_FRAC_HEX[0]}' WHEN 1 THEN '{_FRAC_HEX[1]}'
           WHEN 2 THEN '{_FRAC_HEX[2]}' ELSE '{_FRAC_HEX[3]}' END AS thr
  FROM documents
)
SELECT source, count(*) AS n_total,
       CAST(SUM(CAST(bucket < thr AS BIGINT)) AS BIGINT) AS n_kept,
       round(SUM(CAST(bucket < thr AS BIGINT)) / count(*), 6) AS keep_rate
FROM b GROUP BY source ORDER BY source
"""


# --- decontamination -----------------------------------------------------

DECON_K = 5  # n-gram length for contamination matching
EVAL_MAX_ID = 20  # doc_id < 20 stands in for the held-out benchmark set


def _ngrams_col(text, k: int):
    """Distinct k-token n-grams built by zipping k shifted slices of
    the token array — O(n·k) with no per-index slicing, so the whole
    expression stays inside codegen (same construction as
    dedup.shingles_col, generalized to k)."""
    toks = tokenize(text)
    n = F.size(toks)
    acc = F.slice(toks, 1, n - (k - 1))
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, j, n - (k - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: for every training document
    (doc_id >= EVAL_MAX_ID), count distinct DECON_K-gram sequences it
    shares with the held-out eval set (doc_id < EVAL_MAX_ID).

    Scale shape: benchmark sets are tiny relative to a 100 TB corpus,
    so the eval n-gram set broadcasts — the training side is one scan
    + one per-doc count aggregation, never an all-pairs join."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "ngs", _ngrams_col(F.col("text"), DECON_K)
    )
    eval_ngs = (
        docs.filter(F.col("doc_id") < EVAL_MAX_ID)
        .select(F.explode("ngs").alias("ng"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") >= EVAL_MAX_ID)
    # spread ONLY the hits branch (the CPU-heavy k-gram build +
    # explode, byte-small-scan lesson) — the output spine below stays
    # on the raw scan so a count() over the result keeps eliminating
    # the aggregate-keyed left join instead of paying the exchange.
    # File-metadata variant: the .rdd probe plans the subtree eagerly
    # (~0.3 s of build) which the count()-pruned path would pay
    hits = (
        ensure_min_partitions_files(
            t["documents"]
            .filter(F.col("doc_id") >= EVAL_MAX_ID)
            .select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        )
        .select("doc_id", F.explode(_ngrams_col(F.col("text"), DECON_K)).alias("ng"))
        .join(F.broadcast(eval_ngs), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


DECON_SQL = f"""
WITH ngs AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{DECON_K - 1}], ' ')
                        FOR i IN range(1, len(toks) - {DECON_K - 2})]) AS ngs
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
), ev AS (
  SELECT DISTINCT unnest(ngs) AS ng FROM ngs WHERE doc_id < {EVAL_MAX_ID}
), hits AS (
  SELECT t.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, unnest(ngs) AS ng FROM ngs WHERE doc_id >= {EVAL_MAX_ID}) t
  JOIN ev ON t.ng = ev.ng
  GROUP BY t.doc_id
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS INT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= {EVAL_MAX_ID}) d
LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


# small because the synthetic corpus has ~31 distinct tokens — at 16 the
# vocab covers roughly the frequent half, so OOV rates are non-trivial
VOCAB_SIZE = 16


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab coverage: build the top-``VOCAB_SIZE`` vocabulary
    from the TRAIN split (by corpus frequency, ties broken by token)
    and measure each source's out-of-vocabulary rate on the VAL split —
    the pre-training check that a tokenizer trained on the mixture
    actually covers every source.

    Scale: vocabulary selection is exact two-stage top-k (per-partition
    candidates, then a global rank over <= VOCAB_SIZE x partitions
    rows) — never a global sort of the full vocabulary; the selected
    vocab is VOCAB_SIZE rows and broadcasts into the OOV join."""
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .withColumn("bucket", _bucket_col())
        .withColumn(
            "split",
            F.when(F.col("bucket") < VAL_THRESHOLD, "val").otherwise("train"),
        )
        .select("source", "split", F.explode(tokenize(F.col("text"))).alias("tok"))
    )
    train_counts = (
        toks.filter(F.col("split") == "train").groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    # exact top-k under any partitioning: any global top-k row is in
    # its partition's local top-k (same argument as similarity._partial_topk)
    local_w = Window.partitionBy("pid").orderBy(F.desc("c"), "tok")
    cand = (
        train_counts.withColumn("pid", F.spark_partition_id())
        .withColumn("rn", F.row_number().over(local_w))
        .filter(F.col("rn") <= VOCAB_SIZE)
        .drop("pid", "rn")
    )
    vocab = (
        cand.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
        )
        .filter(F.col("rn") <= VOCAB_SIZE)
        .select("tok")
    )
    val = toks.filter(F.col("split") == "val")
    return (
        val.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT source,
         CASE WHEN {_BUCKET} < '{VAL_THRESHOLD}' THEN 'val' ELSE 'train' END AS split,
         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM toks WHERE split = 'train' GROUP BY tok
  ) ORDER BY c DESC, tok LIMIT {VOCAB_SIZE}
)
SELECT t.source,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
WHERE t.split = 'val'
GROUP BY t.source
ORDER BY t.source
"""


QUERIES = {
    "split_train_val": split_train_val,
    "pack_sequences": pack_sequences,
    "mixture_sample": mixture_sample,
    "decontaminate": decontaminate,
    "vocab_coverage": vocab_coverage,
}

ORACLES = {
    "split_train_val": SPLIT_SQL,
    "pack_sequences": PACK_SQL,
    "mixture_sample": MIXTURE_SQL,
    "decontaminate": DECON_SQL,
    "vocab_coverage": VOCAB_COVERAGE_SQL,
}
