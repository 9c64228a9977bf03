"""Sampling/diversity operators (SURVEY.md §2e extension): weighted
reservoir sampling (A-ES) and distinct-n corpus diversity.

- weighted_sample: Efraimidis–Spirakis A-ES weighted sampling without
  replacement — each doc draws u ~ U(0,1) and the k largest
  u^(1/w) win, giving inclusion probability proportional to weight
  w (here n_chars: longer docs sampled more often, the shape of
  quality- or importance-weighted corpus subsetting).  Determinism
  contract: u comes from the top 48 bits of md5(doc_id) — 48 so the
  integer is exact in a double and (v+0.5)/2^48 is an exact
  power-of-two scale on BOTH engines; ranking uses ln(u)/w
  (monotone in u^(1/w)) cast to DECIMAL(24,12) then rounded to 9
  decimals with doc_id tie-break (the ccnet_perplexity_buckets
  round-before-rank pattern — a 1-ulp ln() delta between engines
  cannot reorder).
- ngram_diversity: distinct-n diversity per source for n=1,2,3
  (distinct n-grams / total n-grams) — the standard repetitiveness /
  mode-collapse signal for generated or scraped corpora.

Scale design:
- weighted_sample is one scan + TakeOrderedAndProject: every
  partition keeps its local top-k, the driver merges k×partitions
  rows.  No global sort, no shuffle of the corpus.  At 100 TB the
  only driver-side data is k rows.
- ngram_diversity shuffles (source, n, gram) once with map-side
  partial counts; count(DISTINCT gram) is Spark's two-phase
  distinct-aggregate (expand + two exchanges on uniform keys).
  Gram construction is the zip_with shifted-slice form (stays in
  codegen, O(len·n), no per-index slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, tokenize
from icechunk_spark.operators.dedup import DUCK_TOKS
from icechunk_spark.operators.textquality import _grams_col

SAMPLE_K = 25

# exact-in-double hash → uniform: top 12 hex chars of md5 = 48 bits
_HEX12_INT = " + ".join(
    f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
    for i in range(12)
)
_TWO48 = float(2**48)


def _grams_all(toks, n: int):
    """All (non-distinct) n-gram strings of a token array — total
    occurrence counts need duplicates, unlike pipeline_ext._ngrams_col.
    Delegates to textquality._grams_col (ONE shared construction; a
    second copy would silently diverge the oracles that depend on
    identical gram building)."""
    if n == 1:
        return toks
    return _grams_col(toks, n)


def aes_key_col(id_col: str = "doc_id", weight_col: str = "n_chars"):
    """The A-ES ranking key ln(u)/w as a column, u from the top 48
    md5 bits of the stringified id (exact in a double on both
    engines), DECIMAL-rounded to 9 so a 1-ulp ln() delta between
    engines cannot reorder.  Shared by weighted_sample and
    curate_pipeline.curate_select."""
    v = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10).cast(
        "double"
    )
    u = (v + F.lit(0.5)) / F.lit(_TWO48)
    return (
        F.round((F.ln(u) / F.col(weight_col)).cast("decimal(24,12)"), 9)
        .cast("double")
        .alias("w_key")
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-SAMPLE_K docs by the A-ES key ln(u)/n_chars (desc)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select("doc_id", "n_chars", aes_key_col())
        .orderBy(F.desc("w_key"), "doc_id")
        .limit(SAMPLE_K)
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       CAST(round(CAST(ln(({_HEX12_INT} + 0.5) / {2**48}.0) / n_chars
                       AS DECIMAL(24,12)), 9) AS DOUBLE) AS w_key
FROM (SELECT doc_id, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS hh
      FROM documents)
ORDER BY w_key DESC, doc_id
LIMIT {SAMPLE_K}
"""


def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct-n / total-n per (source, n) for n = 1, 2, 3.

    All three gram orders are built in ONE projection and exploded
    from one flattened (n, g) struct array — a union of three
    explode branches would scan the corpus three times (AQE gives
    separate query stages no exchange reuse; the ngram_containment
    union trap, PLANS.md round-8)."""
    # spread the byte-small documents scan so the three-order gram
    # explode (the CPU-heavy stage) runs on every core, not the 1-2
    # scan splits (no-op at real scale — the minhash/lsh_quality
    # pattern); all downstream aggregates are counts/countDistinct,
    # order-independent under any partitioning
    docs = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["documents"].select("source", "text"),
        table_parquet_files(sf_dir, "documents"),
    ).withColumn("toks", tokenize(F.col("text")))

    def tagged(n: int):
        return F.transform(
            _grams_all(F.col("toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    grams = docs.select(
        "source",
        F.explode(F.flatten(F.array(tagged(1), tagged(2), tagged(3)))).alias("p"),
    ).select("source", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.countDistinct("g").alias("distinct_ngrams"),
            F.round(
                (F.countDistinct("g") / F.count(F.lit(1))).cast("decimal(18,12)"), 6
            )
            .cast("double")
            .alias("diversity"),
        )
        .orderBy("source", "n")
    )


NGRAM_DIVERSITY_SQL = f"""
WITH toks AS (
  SELECT source, {DUCK_TOKS} AS toks FROM documents
), g AS (
  SELECT source, 1 AS n, unnest(toks) AS g FROM toks
  UNION ALL
  SELECT source, 2 AS n,
         unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
  FROM toks WHERE len(toks) >= 2
  UNION ALL
  SELECT source, 3 AS n,
         unnest([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS g
  FROM toks WHERE len(toks) >= 3
)
SELECT source, n, count(*) AS total_ngrams,
       count(DISTINCT g) AS distinct_ngrams,
       CAST(round(CAST(count(DISTINCT g) / CAST(count(*) AS DOUBLE)
                       AS DECIMAL(18,12)), 6) AS DOUBLE) AS diversity
FROM g GROUP BY source, n ORDER BY source, n
"""


QUERIES = {
    "weighted_sample": weighted_sample,
    "ngram_diversity": ngram_diversity,
}

ORACLES = {
    "weighted_sample": WEIGHTED_SAMPLE_SQL,
    "ngram_diversity": NGRAM_DIVERSITY_SQL,
}
