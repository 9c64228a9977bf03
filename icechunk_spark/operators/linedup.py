"""Line/paragraph-granularity curation operators (SURVEY.md §2e
extension): C4-style line-level exact dedup, asymmetric n-gram
containment (subset-duplication detection), IDF novelty scoring, and
robust (median/MAD) length outlier detection.

These fill the granularity gap between document-level dedup
(dedup.py: whole-doc hash / MinHash / SimHash) and substring-level
dedup (cross_doc_spans): real web corpora are deduplicated at the
LINE level first (the C4 recipe removes any line that occurs more
than once in the corpus) and screened for documents that are near-
SUBSETS of other documents — a case symmetric Jaccard misses because
a small doc contained in a big one has low |A∩B|/|A∪B| but high
|A∩B|/|A|.  The containment pipeline keys its joins on a 16-hex
(64-bit) md5 prefix of each shingle rather than the raw ~50-char
string — the hash is computed identically in Spark and DuckDB, so any
(astronomically rare) collision is shared by both engines and the
oracle still agrees; shuffle width drops ~3×.

Scale design:
- line_dedup is one md5-keyed window min + one per-doc aggregate: two
  shuffles total, both on uniformly-hashed keys, no joins.  The C4
  recipe at 100 TB is exactly this shape (the line-hash shuffle is
  the cost; a 10-token line key is ~uniform so no skew salting is
  needed).
- ngram_containment reuses the df-capped shared-shingle machinery
  from dedup.ngram_jaccard_pairs: candidate generation is a bucketed
  join bounded by the df cap, never O(n²).
- idf_doc_score shuffles (tok) once for document frequencies and
  (doc_id) once for the per-doc fold; the fold is array_sort-ordered
  so the float sum is bit-stable across partitionings (the
  word_entropy pattern).
- length_mad_outliers touches the data once: integer lengths have
  bounded support, so a map-side-combined (source, n_chars) histogram
  carries exact medians/MAD/outlier counts via cumulative sums over a
  ~4k-row frame.  length_mad_outliers_approx is the unbounded-support
  form: percentile_approx (GK sketch, partial-aggregable) in the
  two-pass broadcast-back shape — exact (= quantile_disc) while
  groups hold <= MAD_ACCURACY rows, epsilon-approximate past that.
  Measured at sf10: the sketch's per-row update costs ~2.3x the exact
  median's accumulate at 25k rows/source — the sketch pays off only
  when per-group value collection stops fitting (the 100 TB case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import (
    ensure_min_partitions_files,
    normalized_text,
    tokenize,
)
from icechunk_spark.operators.dedup import (
    DUCK_SHINGLES,
    DUCK_TOKS,
    EMBEDDING_NEARDUP_SQL,
    NGRAM_DF_CAP,
    NGRAM_JACCARD_SQL,
    embedding_neardup,
    ngram_jaccard_pairs,
    shingles_col,
)

LINE_TOKENS = 10
CONTAINMENT_THRESHOLD = 0.8

# --- C4-style line-level dedup ------------------------------------------

def lines_col(text) -> "F.Column":
    """Positional LINE_TOKENS-token segments of the whitespace
    tokenization, as an array<string> — the shared "line" definition
    for line_dedup and refine_ext.clean_reassemble."""
    toks = tokenize(text)
    n_chunks = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    # guard: sequence(0, -1) would yield [0, -1] (negative step), not []
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level exact dedup statistics per document (the C4 recipe:
    a line that occurs more than once in the corpus is kept only at
    its first occurrence).  "Lines" are consecutive LINE_TOKENS-token
    segments of the whitespace tokenization — the corpus has no
    newlines, so segmentation is positional, which is also what a
    tokenized-and-packed corpus looks like in practice.

    First occurrence = lexicographic min of (doc_id, line_idx) within
    the line's md5 group.  Resolved with a hash AGGREGATE per line
    hash, not a window: min(struct) partial-combines map-side, so
    duplicate lines collapse BEFORE the shuffle and nothing sorts —
    the original window-min formulation shuffled and sorted every
    line row (measured 8.1 s at sf10; this shape ~3 s).  The per-doc
    totals are a second map-side-combined aggregate; the final join
    is 1-row-per-doc on both sides.
    Output: per-doc line counts and the fraction of lines dropped."""
    t = load_tables(spark, sf_dir)
    lines = lines_col(F.col("text"))
    # project to (doc_id, line_idx, h) BEFORE any shuffle: the line
    # text itself (10 tokens, ~6x the md5's bytes) never needs to move
    ln = (
        t["documents"]
        .select("doc_id", F.posexplode(lines).alias("line_idx", "line"))
        .select("doc_id", "line_idx", F.md5("line").alias("h"))
    )
    firsts = ln.groupBy("h").agg(F.min(F.struct("doc_id", "line_idx")).alias("m"))
    kept = (
        firsts.select(F.col("m.doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("kept_lines"))
    )
    totals = ln.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("kept_lines"), F.lit(0)).alias("kept_lines"),
            F.round(
                1 - F.coalesce(F.col("kept_lines"), F.lit(0)) / F.col("n_lines"), 4
            ).alias("dup_line_frac"),
        )
        .orderBy("doc_id")
    )


DUCK_LINES = f"""
lines AS (
  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS line_idx, unnest(ls) AS line
  FROM (
    SELECT doc_id,
           [array_to_string(toks[i*{LINE_TOKENS}+1 : i*{LINE_TOKENS}+{LINE_TOKENS}], ' ')
            FOR i IN range(0, CAST(ceil(len(toks)/{LINE_TOKENS}.0) AS INT))] AS ls
    FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
  )
)
"""

LINE_DEDUP_SQL = f"""
WITH {DUCK_LINES},
marked AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY md5(line)
                                 ORDER BY doc_id, line_idx) = 1 AS INT) AS kept
  FROM lines
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS kept_lines,
       round(1 - sum(kept) * 1.0 / count(*), 4) AS dup_line_frac
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""


# --- asymmetric n-gram containment --------------------------------------

def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed subset-duplication pairs: doc_a whose shingle set is
    ≥ CONTAINMENT_THRESHOLD contained in doc_b's
    (|A∩B| / |A| — asymmetric, so a short doc embedded in a long one
    scores high even when the symmetric Jaccard is low).  Uses the
    same df-capped shingle universe as ngram_jaccard so hot
    boilerplate phrases cannot quadratically blow up the join."""
    t = load_tables(spark, sf_dir)
    # persist the HASHED exploded frame (24 bytes/row): it feeds the
    # hot-shingle count, the anti-join input, and the per-doc sizes —
    # one tokenize+shingle+md5 pass instead of three.  The scan is
    # spread first: a byte-small documents parquet arrives as 1-2
    # splits, which would run the CPU-heavy tokenize+shingle+md5 on
    # 1-2 tasks (no-op at real scale — the minhash/lsh_quality
    # pattern)
    ex_all = (
        ensure_min_partitions_files(
            t["documents"].select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        )
        .select("doc_id", F.explode(shingles_col(F.col("text"))).alias("s0"))
        .select("doc_id", F.substring(F.md5("s0"), 1, 16).alias("s"))
        .persist()
    )
    # hot detection stays a COUNT aggregate (map-side combined, safe
    # under arbitrarily hot shingles) — folding the cap into the
    # collect_list bucket below would materialize an unbounded list
    # for a boilerplate shingle before discarding it.  persist: ex is
    # consumed by both the sizes and buckets branches, and without the
    # persist each recomputes this aggregate over the cached explode
    # (AQE does not reuse the exchange across the branches)
    hot = (
        ex_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
        .select("s")
        .persist()
    )
    ex = ex_all.join(broadcast(hot), "s", "left_anti")
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # bucket-enumerate pairs instead of a self-join: after the df cap
    # every bucket holds ≤ NGRAM_DF_CAP docs, so collect_list is
    # bounded and the ordered pairs expand with one higher-order
    # function — one shuffle leg of the exploded set instead of the
    # self-join's two
    buckets = ex.groupBy("s").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    pair_arr = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.size("ds")),
                lambda y: F.struct(x.alias("lo"), y.alias("hi")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.lo").alias("doc_lo"), F.col("p.hi").alias("doc_hi"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # |A∩B| is symmetric: count undirected pairs ONCE, join both
    # endpoint sizes, then explode each pair into its two directed
    # rows in the same projection.  (The previous union of two
    # projections of `shared` looked free but was not: AQE compiled
    # the branches as separate query stages with no exchange reuse,
    # so the whole buckets→pair-explode→(lo,hi) aggregate pipeline —
    # the expensive 60 % of the query — ran twice.)
    sl = sizes.select(F.col("doc_id").alias("doc_lo"), F.col("n_sh").alias("n_lo"))
    sh = sizes.select(F.col("doc_id").alias("doc_hi"), F.col("n_sh").alias("n_hi"))
    both = F.array(
        F.struct(
            F.col("doc_lo").alias("doc_a"),
            F.col("doc_hi").alias("doc_b"),
            (F.col("shared") / F.col("n_lo")).alias("cont"),
        ),
        F.struct(
            F.col("doc_hi").alias("doc_a"),
            F.col("doc_lo").alias("doc_b"),
            (F.col("shared") / F.col("n_hi")).alias("cont"),
        ),
    )
    return (
        shared.join(sl, "doc_lo")
        .join(sh, "doc_hi")
        .select(F.explode(both).alias("p"))
        .select("p.*")
        .filter(F.col("cont") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", F.round("cont", 3).alias("containment"))
        .orderBy("doc_a", "doc_b")
    )


NGRAM_CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT doc_id, {DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
), ex_all AS (SELECT doc_id, substr(md5(unnest(sh)), 1, 16) AS s FROM sh),
hot AS (SELECT s FROM ex_all GROUP BY s HAVING count(*) > {NGRAM_DF_CAP}),
ex AS (SELECT doc_id, s FROM ex_all ANTI JOIN hot USING (s)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(shared * 1.0 / sa.n_sh, 3) AS containment
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
WHERE shared * 1.0 / sa.n_sh >= {CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# --- IDF novelty score ---------------------------------------------------

def idf_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average inverse document frequency over each document's
    DISTINCT tokens — a rarity/novelty proxy used for diversity-aware
    selection (documents of common boilerplate score low, documents
    carrying rare vocabulary score high).  idf = ln(N / df).

    Bit-stability comes from the money_sum pattern: each term casts to
    DECIMAL(18,12) before the sum, so the per-doc accumulation is
    EXACT and order-independent — a plain partial-aggregated groupBy
    (map-side combined) instead of the original collect_list +
    array_sort + fold, which materialized and sorted every (tok, df)
    struct per document (measured 30.3 s at sf10; this shape retimes
    at ~4 s)."""
    t = load_tables(spark, sf_dir)
    dt = t["documents"].select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok")
    )
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t["documents"].agg(F.count(F.lit(1)).alias("n_docs"))
    term = F.log(F.col("n_docs") / F.col("df")).cast("decimal(18,12)")
    return (
        dt.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_distinct_toks"),
            F.sum(term).alias("ssum"),
        )
        .select(
            "doc_id",
            "n_distinct_toks",
            F.round(
                F.col("ssum").cast("double") / F.col("n_distinct_toks"), 4
            ).alias("avg_idf"),
        )
        .orderBy("doc_id")
    )


IDF_DOC_SCORE_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents
), dfreq AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_distinct_toks,
       round(CAST(sum(CAST(ln(n_docs * 1.0 / df) AS DECIMAL(18,12))) AS DOUBLE)
               / count(*), 4) AS avg_idf
FROM dt JOIN dfreq USING (tok), n
GROUP BY doc_id
ORDER BY doc_id
"""


# --- robust length outliers ----------------------------------------------

MAD_K = 3.0


def _weighted_median(hist: DataFrame, value_col: str) -> DataFrame:
    """Exact interpolated median per source from a (source, value, c)
    histogram: value_at(rank) = first value whose cumulative count
    reaches the rank, median = mean of the floor/ceil ranks of
    (n+1)/2 — bit-identical to F.median over the expanded rows.
    Returns (source, med double, n_docs)."""
    w_cum = (
        Window.partitionBy("source")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(Window.partitionBy("source")))
        .withColumn("lo_r", F.floor((F.col("n") + 1) / 2))
        .withColumn("hi_r", F.ceil((F.col("n") + 1) / 2))
    )
    v = F.col(value_col)
    return h.groupBy("source").agg(
        (
            (
                F.min(F.when(F.col("cum") >= F.col("lo_r"), v))
                + F.min(F.when(F.col("cum") >= F.col("hi_r"), v))
            )
            / 2.0
        ).alias("med"),
        F.max("n").alias("n_docs"),
    )


def length_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length screening: median(n_chars), the
    median absolute deviation, and how many documents sit more than
    MAD_K·MAD from the median — the outlier filter a curation
    pipeline runs before trusting per-source length statistics
    (means/stddevs are themselves corrupted by the outliers this
    catches).

    Plan: integer lengths have bounded support, so the data is
    touched ONCE — a map-side-combined (source, n_chars) histogram
    (shuffle rows = distinct pairs, ~4k at sf10 vs 500k docs); the
    exact interpolated medians, the MAD, and the outlier count all
    derive from cumulative sums over that tiny frame.  Exact values
    (oracle: plain median()); at 100 TB this holds as long as the
    length support stays bounded — for an unbounded-support metric
    use ``length_mad_outliers_approx`` (sketch, same screening)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("source", "n_chars")
    hist = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    med = _weighted_median(hist, "n_chars").withColumnRenamed("med", "med_chars")
    dev_hist = (
        hist.join(broadcast(med.select("source", "med_chars")), "source")
        .select(
            "source",
            F.abs(F.col("n_chars") - F.col("med_chars")).alias("adev"),
            "c",
        )
        .groupBy("source", "adev")
        .agg(F.sum("c").alias("c"))
    )
    mad = (
        _weighted_median(dev_hist, "adev")
        .withColumnRenamed("med", "mad_chars")
        .drop("n_docs")
    )
    return (
        dev_hist.join(broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(
                    F.col("adev") > F.lit(MAD_K) * F.col("mad_chars"), F.col("c")
                ).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
        .join(med, "source")
        .join(mad, "source")
        .select("source", "n_docs", "med_chars", "mad_chars", "n_outliers")
        .orderBy("source")
    )


LENGTH_MAD_SQL = f"""
WITH med AS (
  SELECT source, median(n_chars) AS med_chars FROM documents GROUP BY source
), dev AS (
  SELECT d.source, abs(d.n_chars - m.med_chars) AS adev, m.med_chars
  FROM documents d JOIN med m ON d.source = m.source
), mad AS (
  SELECT source, median(adev) AS mad_chars, count(*) AS n_docs
  FROM dev GROUP BY source
)
SELECT dev.source, mad.n_docs, dev.med_chars AS med_chars, mad.mad_chars,
       CAST(sum(CAST(dev.adev > {MAD_K} * mad.mad_chars AS INT)) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.source = mad.source
GROUP BY dev.source, mad.n_docs, dev.med_chars, mad.mad_chars
ORDER BY dev.source
"""


#: Sketch accuracy for the approx variant: exact (rank error 0) while
#: every per-source group holds <= MAD_ACCURACY rows — i.e. through
#: the sf10 bench (25k docs/source).  At 100 TB dial down to the
#: 10^4 default: the plan is unchanged, the medians become epsilon-
#: approximate, and the aggregation stays one sketch-mergeable pass.
MAD_ACCURACY = 100_000


def length_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``length_mad_outliers``: same two-pass
    median/MAD screening, but both medians come from
    ``percentile_approx`` (a partial-aggregable GK sketch — map-side
    combinable, no per-group sort) instead of the exact interpolated
    median.  With accuracy >= group size the sketch is EXACTLY the
    discrete (type-1) median, which DuckDB expresses as
    ``quantile_disc`` — so this stays full-value oracle-checked at
    every gate SF while keeping the sketch plan that survives the
    scale-up.  tests/test_linedup.py pins the approx-vs-exact
    tolerance invariant."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("source", "n_chars")
    med = docs.groupBy("source").agg(
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(MAD_ACCURACY)).alias("med_chars")
    )
    dev = docs.join(broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med_chars"))
    )
    mad = dev.groupBy("source").agg(
        F.percentile_approx("adev", F.lit(0.5), F.lit(MAD_ACCURACY)).alias("mad_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        dev.join(broadcast(mad.select("source", "mad_chars")), "source")
        .groupBy("source")
        .agg(
            F.sum(
                (F.col("adev") > F.lit(MAD_K) * F.col("mad_chars")).cast("int")
            ).alias("n_outliers")
        )
        .join(med, "source")
        .join(mad, "source")
        .select("source", "n_docs", "med_chars", "mad_chars", "n_outliers")
        .orderBy("source")
    )


LENGTH_MAD_APPROX_SQL = f"""
WITH med AS (
  SELECT source, quantile_disc(n_chars, 0.5) AS med_chars
  FROM documents GROUP BY source
), dev AS (
  SELECT d.source, abs(d.n_chars - m.med_chars) AS adev, m.med_chars
  FROM documents d JOIN med m ON d.source = m.source
), mad AS (
  SELECT source, quantile_disc(adev, 0.5) AS mad_chars, count(*) AS n_docs
  FROM dev GROUP BY source
)
SELECT dev.source, mad.n_docs, dev.med_chars AS med_chars, mad.mad_chars,
       CAST(sum(CAST(dev.adev > {MAD_K} * mad.mad_chars AS INT)) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.source = mad.source
GROUP BY dev.source, mad.n_docs, dev.med_chars, mad.mad_chars
ORDER BY dev.source
"""


# --- tiered dedup cascade ------------------------------------------------

def dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shaped tiered dedup decision: a document is dropped
    when an EARLIER (smaller doc_id) document matches it under any
    tier — exact (normalized-text md5), n-gram (shingle Jaccard ≥ 0.5
    over the df-capped universe), or semantic (embedding cosine over
    sign-LSH candidates; vec_id is 1:1 with doc_id in the testdata).
    ``reason`` reports the strongest matching tier (exact > ngram >
    semantic); kept docs carry reason NULL.

    Greedy, non-cascading: "earlier doc" means earlier in doc_id
    order, not "earlier KEPT doc" — the standard one-pass
    approximation (an exact cascade is iterative and data-dependent).
    Each tier's pair generation is the already-bucketed machinery
    (hash groupBy / df-capped shingle join / LSH bands), so the
    cascade inherits their 100 TB shapes; the final combine is one
    union + one groupBy-min on doc_id."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    h = docs.withColumn("h", F.md5(normalized_text(F.col("text"))))
    w = Window.partitionBy("h")
    exact_drop = (
        h.withColumn("first_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") > F.col("first_id"))
        .select("doc_id", F.lit(1).alias("pri"))
    )
    # persist: ngram_jaccard_pairs scans its input twice (hot-shingle
    # aggregate + anti-join) — cache the shingle arrays like the
    # ngram_jaccard wrapper does, spread first so the CPU-heavy
    # shingle pass materializes on every core (no-op at real scale)
    sh = (
        ensure_min_partitions_files(
            docs.select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        )
        .select("doc_id", shingles_col(F.col("text")).alias("sh"))
        .persist()
    )
    near_drop = ngram_jaccard_pairs(sh).select(
        F.col("doc_b").alias("doc_id"), F.lit(2).alias("pri")
    )
    sem_drop = embedding_neardup(spark, sf_dir).select(
        F.col("vec_b").alias("doc_id"), F.lit(3).alias("pri")
    )
    dropped = (
        exact_drop.unionByName(near_drop)
        .unionByName(sem_drop)
        .groupBy("doc_id")
        .agg(F.min("pri").alias("pri"))
    )
    return (
        docs.select("doc_id")
        .join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            F.col("pri").isNull().cast("int").alias("keep"),
            F.when(F.col("pri") == 1, "exact")
            .when(F.col("pri") == 2, "ngram")
            .when(F.col("pri") == 3, "semantic")
            .alias("reason"),
        )
        .orderBy("doc_id")
    )


DEDUP_CASCADE_SQL = f"""
WITH drops AS (
  SELECT doc_id, 1 AS pri
  FROM (
    SELECT doc_id,
           min(doc_id) OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           ) AS first_id
    FROM documents
  ) WHERE doc_id > first_id
  UNION ALL
  SELECT doc_b AS doc_id, 2 AS pri FROM ({NGRAM_JACCARD_SQL})
  UNION ALL
  SELECT vec_b AS doc_id, 3 AS pri FROM ({EMBEDDING_NEARDUP_SQL})
), m AS (SELECT doc_id, min(pri) AS pri FROM drops GROUP BY doc_id)
SELECT d.doc_id,
       CAST(m.pri IS NULL AS INT) AS keep,
       CASE m.pri WHEN 1 THEN 'exact' WHEN 2 THEN 'ngram'
                  WHEN 3 THEN 'semantic' END AS reason
FROM documents d LEFT JOIN m USING (doc_id)
ORDER BY d.doc_id
"""


QUERIES = {
    "line_dedup": line_dedup,
    "dedup_cascade": dedup_cascade,
    "ngram_containment": ngram_containment,
    "idf_doc_score": idf_doc_score,
    "length_mad_outliers": length_mad_outliers,
    "length_mad_outliers_approx": length_mad_outliers_approx,
}

ORACLES = {
    "line_dedup": LINE_DEDUP_SQL,
    "dedup_cascade": DEDUP_CASCADE_SQL,
    "ngram_containment": NGRAM_CONTAINMENT_SQL,
    "idf_doc_score": IDF_DOC_SCORE_SQL,
    "length_mad_outliers": LENGTH_MAD_SQL,
    "length_mad_outliers_approx": LENGTH_MAD_APPROX_SQL,
}
