"""Additional corpus/dataset-management operators for LLM pipelines
(SURVEY.md §2e extension): stratified sampling, length-percentile
filtering, per-doc word entropy, int8 embedding quantization error,
and shard assignment.

Scale design: every operator is a pure columnar plan — deterministic
md5 bucketing instead of RNG (stable under re-runs/repartitioning),
per-group percentiles via a single grouped sort, entropy via the
log-sum identity H = log2(n) - sum(c*log2 c)/n so one aggregation
pass suffices, and quantization error as an in-order array fold that
never leaves the JVM.  No UDFs, no driver loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

# --- stratified sample ----------------------------------------------------

# source -> keep-rate tier, applied via the md5 2-hex-digit bucket the
# split_train_val operator uses (rate r keeps bucket < hex(256*r))
_FULL = {"src0", "src1", "src2", "src3", "src4"}
_HALF = {"src5", "src6", "src7", "src8", "src9"}
_FULL_T, _HALF_T, _REST_T = "zz", "80", "33"  # 100% / 50% / ~20%


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source stratified sampling: high-value
    sources kept fully, mid-tier at 50%, the tail at ~20% — the
    standard corpus-mixture downsample, RNG-free so the sample is
    reproducible and insert-stable."""
    t = load_tables(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = (
        F.when(F.col("source").isin(*sorted(_FULL)), _FULL_T)
        .when(F.col("source").isin(*sorted(_HALF)), _HALF_T)
        .otherwise(_REST_T)
    )
    return (
        t["documents"]
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < thr)
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


def _in_list(vals: set[str]) -> str:
    return ", ".join(f"'{v}'" for v in sorted(vals))


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE WHEN source IN ({_in_list(_FULL)}) THEN '{_FULL_T}'
           WHEN source IN ({_in_list(_HALF)}) THEN '{_HALF_T}'
           ELSE '{_REST_T}' END
ORDER BY doc_id
"""


# --- length-percentile filter ---------------------------------------------

P_LO, P_HI = 0.1, 0.9


def length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents whose n_chars lies within the per-source
    [P10, P90] band — the outlier-trim every corpus pipeline applies
    before tokenization.  Per-source thresholds are one grouped
    percentile (exact, interpolated) broadcast back onto the scan."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    bands = docs.groupBy("source").agg(
        F.percentile("n_chars", P_LO).alias("lo"),
        F.percentile("n_chars", P_HI).alias("hi"),
    )
    return (
        docs.join(broadcast(bands), "source")
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


LENGTH_PCT_SQL = f"""
WITH bands AS (
  SELECT source,
         quantile_cont(n_chars, {P_LO}) AS lo,
         quantile_cont(n_chars, {P_HI}) AS hi
  FROM documents GROUP BY source
)
SELECT doc_id, d.source AS source, n_chars
FROM documents d JOIN bands b ON d.source = b.source
WHERE n_chars >= lo AND n_chars <= hi
ORDER BY doc_id
"""


# --- per-doc word entropy -------------------------------------------------

def word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each document's word distribution — a
    cheap diversity/quality proxy (low entropy = repetitive spam).
    Uses H = log2(n) - sum(c*log2 c)/n so the whole thing is one
    explode + two grouped sums."""
    t = load_tables(spark, sf_dir)
    counts = (
        t["documents"]
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # The c*log2(c) sum is folded IN TOKEN ORDER (array_sort on the
    # unique tok key, then a sequential F.aggregate) instead of a
    # partition-order F.sum: float addition is not associative, and an
    # order-dependent sum feeding round(..., 4) can flip at a .00005
    # boundary between runs/partitionings.  The oracle folds the same
    # sorted list, so both engines add the same doubles in the same
    # order — bit-stable (same pattern as cosine/vector_quantize_error).
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("tok", "c"))).alias("pairs"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log2("n_tokens")
                - F.aggregate(
                    "pairs",
                    F.lit(0.0),
                    lambda acc, p: acc + p["c"] * F.log2(p["c"]),
                )
                / F.col("n_tokens"),
                4,
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


WORD_ENTROPY_SQL = """
WITH counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(log2(sum(c))
             - list_reduce(list_transform(list_sort(list({'tok': tok, 'c': c})),
                                          x -> x.c * log2(x.c)),
                           (a, b) -> a + b)
               / sum(c), 4) AS entropy_bits
FROM counts
GROUP BY doc_id
ORDER BY doc_id
"""


# --- int8 quantization error ----------------------------------------------

def _mse_col(emb: Column) -> Column:
    absmax = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0) / absmax
    sq = F.aggregate(
        emb,
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(x.cast("double") - F.round(x.cast("double") * scale) / scale, 2),
    )
    return sq / F.size(emb)


def vector_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization (per-vector absmax scaling,
    the standard embedding-compression layout) with per-label
    reconstruction-error stats.  The per-vector MSE is an in-order
    JVM array fold; only label aggregates shuffle."""
    t = load_tables(spark, sf_dir)
    per_vec = t["embeddings"].select("label", _mse_col(F.col("embedding")).alias("mse"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.col("mse").cast("decimal(18,15)")).cast("double")
                / F.count(F.lit(1)),
                10,
            ).alias("avg_mse"),
            F.round(F.max("mse"), 10).alias("max_mse"),
        )
        .orderBy("label")
    )


_D_MSE = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(embedding, x -> power(CAST(x AS DOUBLE)"
    "   - round(CAST(x AS DOUBLE) * (127.0 / absmax)) / (127.0 / absmax), 2))),"
    " (a, b) -> a + b) / len(embedding)"
)

VECTOR_QUANTIZE_SQL = f"""
WITH v AS (
  SELECT label, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS absmax
  FROM embeddings
), per_vec AS (
  SELECT label, {_D_MSE} AS mse FROM v
)
SELECT label,
       count(*) AS n_vectors,
       round(CAST(sum(CAST(mse AS DECIMAL(18,15))) AS DOUBLE) / count(*), 10) AS avg_mse,
       round(max(mse), 10) AS max_mse
FROM per_vec
GROUP BY label
ORDER BY label
"""


# --- shard assignment -----------------------------------------------------

N_OUT_SHARDS = 8


def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to output shards by content hash and report
    shard balance (doc + char totals) — the write-layout step before
    emitting training shards.  Hash sharding keeps shards balanced
    regardless of doc_id clustering."""
    t = load_tables(spark, sf_dir)
    b0 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    return (
        t["documents"]
        .withColumn("shard", (b0 % N_OUT_SHARDS).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
    )


_HEX2 = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

SHARD_ASSIGN_SQL = f"""
SELECT CAST({_HEX2} % {N_OUT_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY shard
ORDER BY shard
"""


# --- bigram LM perplexity proxy ------------------------------------------

LM_ADD_K = 1.0  # add-one smoothing


def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: train a corpus-level bigram LM
    (add-one smoothing) in one aggregation pass, then score every
    document by its mean bigram log-probability — the KenLM-filter
    shape (CCNet/Gopher pipelines) without the external model.  Two
    shuffles total: bigram-count agg, then score agg after a join of
    doc bigrams against the model."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select("doc_id", tokenize(F.col("text")).alias("toks"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # persist: the bigram explode feeds the pair-count, context-count
    # and scoring branches — one tokenize+explode pass instead of three
    bigrams = bigrams.persist()
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bigrams.select(F.col("w2").alias("w")).union(
        bigrams.select(F.col("w1"))
    ).distinct().count()
    logp = F.log(
        (F.col("c12") + LM_ADD_K) / (F.col("c1") + LM_ADD_K * F.lit(float(vocab)))
    )
    return (
        bigrams.join(pair_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_BG = (
    "SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z\n"
    "  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks\n"
    "        FROM documents)\n"
    "  WHERE len(toks) >= 2"
)

BIGRAM_LOGPROB_SQL = f"""
WITH bg AS (
  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM ({_BG})
), pair_counts AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
), ctx_counts AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), vocab AS (
  SELECT count(*) AS v FROM (SELECT w2 AS w FROM bg UNION SELECT w1 FROM bg)
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(sum(ln((c12 + {LM_ADD_K}) / (c1 + {LM_ADD_K} * v))) / count(*), 4)
         AS avg_logprob
FROM bg
JOIN pair_counts USING (w1, w2)
JOIN ctx_counts USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
ORDER BY doc_id
"""


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document with the corpus bigram LM (the same
    model bigram_logprob_score trains), then split each LANGUAGE into
    head/middle/tail terciles by LM score — the standard curriculum /
    quality-stratification step before mixing a pre-training corpus.

    Determinism contract: scores are rounded to 4 decimals BEFORE
    ranking and ties break on doc_id, so the ntile(3) boundaries are
    identical on any engine and any partitioning; bucket means then
    sum the already-rounded scores in DECIMAL.

    Scale shape: identical to bigram_logprob_score (two shuffles for
    the LM + score), plus one per-language window — partitioned by
    lang, so parallelism is the language count for the rank stage
    only; everything upstream stays fully parallel."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    toks = docs.select("doc_id", "lang", tokenize(F.col("text")).alias("toks"))
    bigrams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select("doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # persist: the bigram explode feeds the pair-count, context-count
    # and scoring branches — one tokenize+explode pass instead of three
    bigrams = bigrams.persist()
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        bigrams.select(F.col("w2").alias("w"))
        .union(bigrams.select(F.col("w1")))
        .distinct()
        .count()
    )
    logp = F.log(
        (F.col("c12") + LM_ADD_K) / (F.col("c1") + LM_ADD_K * F.lit(float(vocab)))
    )
    scores = (
        bigrams.join(pair_counts, ["w1", "w2"])
        .join(ctx_counts, "w1")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum(logp) / F.count(F.lit(1)), 4).alias("score"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    bucketed = scores.withColumn("bucket", F.ntile(3).over(w))
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # the DECIMAL(20,8) intermediate absorbs double
            # representation error before the 4-digit round: a mean
            # landing exactly on a .00005 boundary (a 4-decimal sum
            # over n docs does this often) would otherwise round in
            # different directions on different engines
            F.round(
                (
                    F.sum(F.col("score").cast("decimal(18,4)")).cast("double")
                    / F.count(F.lit(1))
                ).cast("decimal(20,8)"),
                4,
            )
            .cast("double")
            .alias("mean_score"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("lang", "bucket")
    )


CCNET_BUCKETS_SQL = f"""
WITH bg AS (
  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (
    SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
    FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
          FROM documents)
    WHERE len(toks) >= 2)
), pair_counts AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
), ctx_counts AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), vocab AS (
  SELECT count(*) AS v FROM (SELECT w2 AS w FROM bg UNION SELECT w1 FROM bg)
), scores AS (
  SELECT doc_id, lang,
         round(sum(ln((c12 + {LM_ADD_K}) / (c1 + {LM_ADD_K} * v))) / count(*), 4)
           AS score
  FROM bg
  JOIN pair_counts USING (w1, w2)
  JOIN ctx_counts USING (w1)
  CROSS JOIN vocab
  JOIN documents USING (doc_id)
  GROUP BY doc_id, lang
), bucketed AS (
  SELECT lang, score,
         ntile(3) OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS bucket
  FROM scores
)
SELECT lang, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(CAST(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                       AS DECIMAL(20,8)), 4)
            AS DOUBLE) AS mean_score,
       min(score) AS min_score,
       max(score) AS max_score
FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
"""


# --- cross-source vocabulary overlap --------------------------------------

VOCAB_OVERLAP_MIN = 0.5  # report source pairs with Jaccard >= this


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every pair of sources — the corpus-
    diversity diagnostic that flags near-identical feeds before they
    skew a mixture.  Same shared-token explode-join shape as
    ngram_jaccard, but at source granularity: the join key space is
    the vocabulary, so candidate pairs are O(sources^2) counts, never
    doc pairs."""
    t = load_tables(spark, sf_dir)
    vocab = (
        t["documents"]
        .select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n_tok"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    shared = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.join(sizes.select(F.col("source").alias("src_a"), F.col("n_tok").alias("na")), "src_a")
        .join(sizes.select(F.col("source").alias("src_b"), F.col("n_tok").alias("nb")), "src_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= VOCAB_OVERLAP_MIN)
        .select("src_a", "src_b", "jaccard")
        .orderBy("src_a", "src_b")
    )


SOURCE_VOCAB_OVERLAP_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
), sizes AS (
  SELECT source, count(*) AS n_tok FROM vocab GROUP BY source
), shared AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       round(shared * 1.0 / (sa.n_tok + sb.n_tok - shared), 4) AS jaccard
FROM shared
JOIN sizes sa ON src_a = sa.source
JOIN sizes sb ON src_b = sb.source
WHERE shared * 1.0 / (sa.n_tok + sb.n_tok - shared) >= {VOCAB_OVERLAP_MIN}
ORDER BY src_a, src_b
"""


# --- BPE pair statistics ---------------------------------------------------

BPE_TOP_K = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the inner
    aggregation of BPE tokenizer training (the most frequent pair is
    the next merge).  One tokenize + one generated-column explode +
    one count: at 100 TB this is a scan plus a shuffle keyed on the
    pair string (bounded key space, uniform — no skew), exactly the
    shape a distributed tokenizer trainer repeats per merge round.
    Deterministic top-k cut: count desc, then pair."""
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.length("tok") >= 2)  # sequence(1, 0) would descend
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


BPE_PAIR_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
), pairs AS (
  SELECT unnest([substring(tok, i, 2) FOR i IN range(1, length(tok))]) AS pair
  FROM toks WHERE length(tok) >= 2
)
SELECT pair, count(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_TOP_K}
"""


QUERIES = {
    "bpe_pair_counts": bpe_pair_counts,
    "ccnet_perplexity_buckets": ccnet_perplexity_buckets,
    "stratified_sample": stratified_sample,
    "bigram_logprob_score": bigram_logprob_score,
    "source_vocab_overlap": source_vocab_overlap,
    "length_percentile_filter": length_percentile_filter,
    "word_entropy": word_entropy,
    "vector_quantize_error": vector_quantize_error,
    "shard_assign": shard_assign,
}

ORACLES = {
    "bpe_pair_counts": BPE_PAIR_SQL,
    "ccnet_perplexity_buckets": CCNET_BUCKETS_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "bigram_logprob_score": BIGRAM_LOGPROB_SQL,
    "source_vocab_overlap": SOURCE_VOCAB_OVERLAP_SQL,
    "length_percentile_filter": LENGTH_PCT_SQL,
    "word_entropy": WORD_ENTROPY_SQL,
    "vector_quantize_error": VECTOR_QUANTIZE_SQL,
    "shard_assign": SHARD_ASSIGN_SQL,
}
