"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2e):
language ID, quality scoring, token counting, document fingerprinting.

All computed with built-in JVM-side expressions (split / filter /
transform / aggregate higher-order functions) — no Python UDFs — so
they run inside whole-stage codegen and scale linearly with document
count.  Each has an exactly-matching DuckDB oracle (same tokenizer,
same hash formula) for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

# Marker ("stopword") sets per language for the heuristic classifier.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "und"),
    "es": ("el", "la", "y"),
    "fr": ("le", "et", "les"),
    "zh": ("zh0", "zh1", "zh2"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("bigint")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language classifier with deterministic argmax
    (ties resolve in LANG_ORDER precedence)."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].withColumn("toks", tokenize(F.col("text")))
    for lang in LANG_ORDER:
        df = df.withColumn(f"s_{lang}", _marker_hits(F.col("toks"), LANG_MARKERS[lang]))
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.when(F.col("s_en") == best, "en")
    for lang in LANG_ORDER[1:]:
        pred = pred.when(F.col(f"s_{lang}") == best, lang)
    return (
        df.withColumn("predicted_lang", pred)
        .withColumn("is_correct", (F.col("predicted_lang") == F.col("lang")).cast("int"))
        .select("doc_id", "lang", "predicted_lang", "is_correct")
        .orderBy("doc_id")
    )


def _duck_hits(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(len(list_filter(toks, t -> t IN ({inlist}))) AS BIGINT)"


LANG_ID_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         {_duck_hits(LANG_MARKERS['en'])} AS s_en,
         {_duck_hits(LANG_MARKERS['de'])} AS s_de,
         {_duck_hits(LANG_MARKERS['es'])} AS s_es,
         {_duck_hits(LANG_MARKERS['fr'])} AS s_fr,
         {_duck_hits(LANG_MARKERS['zh'])} AS s_zh
  FROM tok
)
SELECT doc_id, lang,
       CASE WHEN s_en >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_de >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_es >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END AS predicted_lang,
       CAST(CASE WHEN s_en >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
            WHEN s_de >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
            WHEN s_es >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
            WHEN s_fr >= greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
            ELSE 'zh' END = lang AS INT) AS is_correct
FROM scored
ORDER BY doc_id
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.size(tokenize(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("bigint").alias("n_bpe_tokens"),
            F.length("text").cast("bigint").alias("n_chars_measured"),
        )
        .orderBy("doc_id")
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
ORDER BY doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, repetition, punctuation and
    stopword ratios combined into one score."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].withColumn("toks", tokenize(F.col("text")))
    n_tok = F.size("toks").cast("double")
    n_uniq = F.size(F.array_distinct("toks")).cast("double")
    punct = F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    stop = F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS))).cast("double")
    rep = 1.0 - n_uniq / n_tok
    punct_ratio = punct / F.length("text").cast("double")
    stop_ratio = stop / n_tok
    score = (
        F.lit(0.4) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(0.3) * (1.0 - rep)
        - F.lit(0.2) * punct_ratio
        + F.lit(0.1) * stop_ratio
    )
    # decimal-cast BEFORE rounding: at sf0.1 one doc's raw score lands
    # exactly on a 4-decimal half-point (0.23275) and Spark/DuckDB
    # round the two straddling doubles in different directions — the
    # DECIMAL(24,8) cast absorbs the double representation error so
    # both engines round the same exact decimal (the money_sum gotcha,
    # PLANS.md round-7)
    def r4(c):
        return F.round(c.cast("decimal(24,8)"), 4).cast("double")

    return (
        df.select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            r4(rep).alias("repetition"),
            r4(punct_ratio).alias("punct_ratio"),
            r4(stop_ratio).alias("stopword_ratio"),
            r4(score).alias("quality"),
        )
        .orderBy("doc_id")
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)
QUALITY_SQL = f"""
WITH tok AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
         CAST(len(list_filter(toks, t -> t IN ({_STOP_IN}))) AS DOUBLE) AS stop,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM tok
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(round(CAST(1.0 - n_uniq / n_tok AS DECIMAL(24,8)), 4) AS DOUBLE) AS repetition,
       CAST(round(CAST(punct / n_chars AS DECIMAL(24,8)), 4) AS DOUBLE) AS punct_ratio,
       CAST(round(CAST(stop / n_tok AS DECIMAL(24,8)), 4) AS DOUBLE) AS stopword_ratio,
       CAST(round(CAST(0.4 * least(n_tok / 100.0, 1.0)
             + 0.3 * (1.0 - (1.0 - n_uniq / n_tok))
             - 0.2 * (punct / n_chars)
             + 0.1 * (stop / n_tok) AS DECIMAL(24,8)), 4) AS DOUBLE) AS quality
FROM m
ORDER BY doc_id
"""


FP_MOD = 1_000_000_007
FP_MUL = 131


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the token stream
    (order-sensitive, unlike a bag-of-words hash)."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].withColumn("toks", tokenize(F.col("text")))
    tok_val = lambda tk: (F.ascii(tk) * 31 + F.length(tk)).cast("bigint")  # noqa: E731
    fp = F.aggregate(
        F.col("toks"),
        F.lit(7).cast("bigint"),
        lambda acc, tk: (acc * FP_MUL + tok_val(tk)) % FP_MOD,
    )
    return df.select("doc_id", fp.alias("fp")).orderBy("doc_id")


FINGERPRINT_SQL = f"""
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(7 AS BIGINT),
           list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
                          t -> CAST(ascii(t) * 31 + length(t) AS BIGINT))),
         (acc, v) -> (acc * {FP_MUL} + v) % {FP_MOD}) AS BIGINT) AS fp
FROM documents
ORDER BY doc_id
"""


def ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building: top-100 token bigrams by total count
    and document frequency.  Bigrams come from zipping two shifted
    slices of the token array (one O(n) pass, same pattern as the
    dedup shingles), then explode → two-key agg.  At 100 TB the bigram
    keyspace is huge but uniform (no hot reducer) and the counts are
    partial-combined before the shuffle."""
    t = load_tables(spark, sf_dir)
    toks = tokenize(F.lower(F.col("text")))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        t["documents"]
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("total_count"), F.asc("bigram"))
        .limit(100)
    )


NGRAM_FREQ_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
  FROM documents
), bi AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
  FROM toks, unnest(range(1, len(tk))) AS r(i)
)
SELECT bigram,
       count(*) AS total_count,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM bi
GROUP BY bigram
ORDER BY total_count DESC, bigram ASC
LIMIT 100
"""


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data cleaning pipeline in ONE declarative
    plan: exact-dedup keep-first → drop low-quality docs (quality <
    0.45) → per-language surviving-corpus stats.  Composition stays a
    single Catalyst plan (dedup's groupBy, the quality expressions,
    and the final agg all fuse/pipeline), which is exactly how these
    stages should chain at 100 TB — no materialization between steps."""
    from icechunk_spark.functions import normalized_text

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    keep = (
        docs.withColumn("content_hash", F.md5(normalized_text(F.col("text"))))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    df = docs.join(keep, "doc_id").withColumn("toks", tokenize(F.col("text")))
    n_tok = F.size("toks").cast("double")
    n_uniq = F.size(F.array_distinct("toks")).cast("double")
    punct = F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    stop = F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS))).cast("double")
    quality = (
        F.lit(0.4) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(0.3) * (n_uniq / n_tok)
        - F.lit(0.2) * (punct / F.length("text").cast("double"))
        + F.lit(0.1) * (stop / n_tok)
    )
    # avg over doubles is summation-order sensitive (partial aggs) and
    # can flip round() at exact half boundaries run-to-run; aggregate
    # the 4dp qualities as exact integers and divide once instead
    q_int = F.round(F.col("quality") * 10000).cast("bigint")
    return (
        df.withColumn("quality", F.round(quality, 4))
        .filter(F.col("quality") >= 0.45)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("toks")).cast("bigint").alias("total_tokens"),
            F.round(F.sum(q_int) / (F.count(F.lit(1)) * 10000.0), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


PIPELINE_CLEAN_SQL = f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
), tok AS (
  SELECT d.doc_id, d.lang, d.text,
         list_filter(string_split_regex(d.text, '\\s+'), t -> t <> '') AS toks
  FROM documents d JOIN keep USING (doc_id)
), m AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
         round(0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
               - 0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                        / length(text))
               + 0.1 * (CAST(len(list_filter(toks, t -> t IN ({_STOP_IN}))) AS DOUBLE)
                        / len(toks)), 4) AS quality
  FROM tok
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS DOUBLE)
             / (count(*) * 10000.0), 4) AS avg_quality
FROM m
WHERE quality >= 0.45
GROUP BY lang
ORDER BY lang
"""


QUERIES = {
    "lang_id": lang_id,
    "token_count": token_count,
    "quality_score": quality_score,
    "fingerprint": fingerprint,
    "ngram_freq": ngram_freq,
    "pipeline_clean_corpus": pipeline_clean_corpus,
}

ORACLES = {
    "lang_id": LANG_ID_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "quality_score": QUALITY_SQL,
    "fingerprint": FINGERPRINT_SQL,
    "ngram_freq": NGRAM_FREQ_SQL,
    "pipeline_clean_corpus": PIPELINE_CLEAN_SQL,
}
