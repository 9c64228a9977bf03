"""Corpus-quality operators for LLM-data pipelines (SURVEY.md §2e
extension): exact-substring duplication signal (Lee et al.,
"Deduplicating Training Data Makes Language Models Better"),
Gopher-style repetition/symbol filters (Rae et al., Gopher §A1.1),
and per-document TF-IDF keyword extraction.

All three are explode→aggregate shapes: token/gram counts are
partial-combined before their shuffles (map-side combine), the only
broadcast is a 1-row corpus-size scalar, and nothing touches Python
rows — the per-doc work stays in whole-stage codegen no matter how
long the documents get (no O(n·distinct) higher-order-function scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, tokenize

SPAN_K = 5  # gram length for the exact-substring duplication signal
TFIDF_TOP = 3  # keywords kept per document

# Gopher-style acceptance thresholds (tuned so both classes occur in
# the synthetic corpus; the *shape* of the filter is what matters).
MAX_TOP_TOKEN_FRAC = 0.12
MAX_DUP_BIGRAM_FRAC = 0.55
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.10


def _round4(c: Column) -> Column:
    """Round a ratio to 4 decimals via a DECIMAL(24,8) cast (exact
    HALF_UP on both engines).  round(double, 4) directly is a latent
    cross-engine divergence: a ratio landing EXACTLY on a 4-decimal
    half-point (a function of the DATA — sf0.1 produced one for
    quality_score in r8) straddles two doubles that Spark and DuckDB
    round in opposite directions, and here a half-point landing flips
    a keep/drop predicate.  SQL mirror:
    ``CAST(round(CAST(x AS DECIMAL(24,8)), 4) AS DOUBLE)``."""
    return F.round(c.cast("decimal(24,8)"), 4).cast("double")


def _grams_col(toks: Column, k: int) -> Column:
    """All k-token grams (with multiplicity, order-preserving) by
    zipping k shifted slices — O(n·k), stays inside codegen."""
    n = F.size(toks)
    acc = F.slice(toks, 1, n - (k - 1))
    for j in range(2, k + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, j, n - (k - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, acc).otherwise(F.array().cast("array<string>"))


def dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal: for each document, the
    fraction of its SPAN_K-gram occurrences whose gram appears more
    than once corpus-wide.  This is the per-doc score behind
    suffix-array span dedup (reference use-case: drop or trim docs
    with high duplicated-span coverage before training).

    Scale shape: one explode → gram-count aggregation (shuffle on the
    gram, high-cardinality and uniform, partial-combined) feeding a
    windowless self-aggregation per doc; no all-pairs joins.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # spread ONLY the occ branch (CPU-heavy gram build + explode on a
    # 1-2-split scan; no-op at real scale) — the output spine below
    # stays on the raw scan so a count() over the result keeps
    # eliminating the aggregate-keyed left join (the decontaminate
    # bench-line pattern); all aggregates are counts, order-safe
    occ = (
        ensure_min_partitions_files(
            docs.select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        )
        .withColumn("toks", tokenize(F.lower(F.col("text"))))
        .select("doc_id", F.explode(_grams_col(F.col("toks"), SPAN_K)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = occ.groupBy("g").agg(F.sum("c").alias("total"))
    per_doc = (
        occ.join(totals, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.when(F.col("total") > 1, F.col("c")).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
            F.round(
                F.coalesce(F.col("n_dup") / F.col("n_grams"), F.lit(0.0)), 4
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


DUP_SPAN_SQL = f"""
WITH g AS (
  SELECT doc_id,
         unnest([array_to_string(toks[i:i+{SPAN_K - 1}], ' ')
                 FOR i IN range(1, len(toks) - {SPAN_K - 2})]) AS g
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
        FROM documents)
), occ AS (
  SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g
), tot AS (
  SELECT g, sum(c) AS total FROM occ GROUP BY g
), per_doc AS (
  SELECT occ.doc_id,
         sum(c) AS n_grams,
         sum(CASE WHEN total > 1 THEN c ELSE 0 END) AS n_dup
  FROM occ JOIN tot USING (g)
  GROUP BY occ.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup,
       round(COALESCE(CAST(n_dup AS DOUBLE) / n_grams, 0.0), 4) AS dup_fraction
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
ORDER BY d.doc_id
"""


def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/symbol document filters: mean word
    length window, symbol-to-char ratio, most-frequent-token mass,
    duplicate-bigram mass — plus the combined keep/drop verdict.

    The most-frequent-token mass uses explode → per-(doc, token)
    count → per-doc max instead of a per-doc higher-order-function
    scan: the former is partial-combined and O(tokens), the latter
    would be O(tokens · distinct) per document — the wrong slope for
    book-length documents at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn("toks", tokenize(F.lower(F.col("text"))))
    top_mass = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_token_count"))
    )
    toks = F.col("toks")
    n_tok = F.size(toks).cast("double")
    bigrams = _grams_col(toks, 2)
    mean_wl = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    ).cast("double") / n_tok
    symbol_ratio = (
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("double")
        / F.length("text").cast("double")
    )
    dup_bigram = 1.0 - F.size(F.array_distinct(bigrams)).cast("double") / F.size(
        bigrams
    ).cast("double")
    df = (
        docs.join(top_mass, "doc_id", "left")
        .select(
            "doc_id",
            _round4(mean_wl).alias("mean_word_len"),
            _round4(symbol_ratio).alias("symbol_ratio"),
            _round4(
                F.coalesce(F.col("top_token_count").cast("double") / n_tok, F.lit(0.0))
            ).alias("top_token_frac"),
            _round4(F.coalesce(dup_bigram, F.lit(0.0))).alias("dup_bigram_frac"),
        )
    )
    keep = (
        (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("top_token_frac") <= MAX_TOP_TOKEN_FRAC)
        & (F.col("dup_bigram_frac") <= MAX_DUP_BIGRAM_FRAC)
    )
    return df.withColumn("keep", keep.cast("int")).orderBy("doc_id")


GOPHER_SQL = f"""
WITH tok AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
), top AS (
  SELECT doc_id, max(c) AS top_token_count
  FROM (SELECT doc_id, t, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
        GROUP BY doc_id, t)
  GROUP BY doc_id
), m AS (
  SELECT tok.doc_id,
         CAST(round(CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS DECIMAL(24,8)), 4) AS DOUBLE) AS mean_word_len,
         CAST(round(CAST(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
               / length(text) AS DECIMAL(24,8)), 4) AS DOUBLE) AS symbol_ratio,
         CAST(round(CAST(COALESCE(CAST(top_token_count AS DOUBLE) / len(toks), 0.0)
               AS DECIMAL(24,8)), 4) AS DOUBLE) AS top_token_frac,
         CAST(round(CAST(COALESCE(1.0 - CAST(len(list_distinct(
                 [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
               )) AS DOUBLE) / (len(toks) - 1), 0.0) AS DECIMAL(24,8)), 4) AS DOUBLE)
           AS dup_bigram_frac
  FROM tok JOIN top ON tok.doc_id = top.doc_id
)
SELECT doc_id, mean_word_len, symbol_ratio, top_token_frac, dup_bigram_frac,
       CAST(mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN}
            AND symbol_ratio <= {MAX_SYMBOL_RATIO}
            AND top_token_frac <= {MAX_TOP_TOKEN_FRAC}
            AND dup_bigram_frac <= {MAX_DUP_BIGRAM_FRAC} AS INT) AS keep
FROM m
ORDER BY doc_id
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-TFIDF_TOP keyword extraction: tf(doc, term) ·
    ln(N / df(term)), deterministic tie-break on the term itself.

    Scale shape: tf is an explode + partial-combined count; df is a
    second aggregation over the *already-reduced* (doc, term) pairs
    (never the raw token stream); N is a broadcast 1-row scalar; the
    final per-doc top-k is a window over doc_id — the same partitioning
    the tf aggregation just produced, so no extra shuffle.
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.withColumn("toks", tokenize(F.lower(F.col("text"))))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "rank", "term", F.col("tf").cast("bigint").alias("tf"), "tfidf")
        .orderBy("doc_id", "rank")
    )


TFIDF_SQL = f"""
WITH tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
        FROM documents)
  GROUP BY doc_id, t
), idf AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / idf.df), 4) AS tfidf
  FROM tf JOIN idf USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, tfidf
FROM ranked WHERE rank <= {TFIDF_TOP}
ORDER BY doc_id, rank
"""


QUERIES = {
    "dup_span_fraction": dup_span_fraction,
    "gopher_quality_filters": gopher_quality_filters,
    "tfidf_top_terms": tfidf_top_terms,
}

ORACLES = {
    "dup_span_fraction": DUP_SPAN_SQL,
    "gopher_quality_filters": GOPHER_SQL,
    "tfidf_top_terms": TFIDF_SQL,
}
