"""Round-6 corpus-curation operators (SURVEY.md §2e/§2b extension):
winnowing fingerprints (Schleimer et al., "Winnowing: Local Algorithms
for Document Fingerprinting" — the MOSS selection rule), temperature-
based source mixture weights (the sampling-weight computation behind
multi-source pre-training mixtures), a power-of-two token-length
histogram (sequence-packing diagnostic), weekly cohort retention over
the events stream, and a distributed embedding covariance matrix.

Scale shapes:
- winnowing: per-document rolling min over gram hashes — the window is
  PARTITIONED BY doc_id (parallelism = number of documents, never a
  global sort), and the gram explode is the same O(n·k) zip-of-slices
  used by textquality (no Python, no per-row UDFs).
- mixture weights / histogram: single groupBy aggregations with
  map-side combine; the normalizing constants are 1-row broadcast
  joins.
- cohort retention: two shuffles on user_id / (cohort, week) — both
  high-cardinality uniform keys; the cohort-size join broadcasts.
- covariance: posexplode² turns n vectors of dim d into n·d(d+1)/2
  upper-triangle product terms aggregated by (i, j) — d²/2 keys
  shuffle only aggregated partials (map-side combine), the driver sees
  d(d+1)/2 rows.  Sums accumulate in DECIMAL so results are
  bit-identical under any partitioning (and to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, tokenize
from icechunk_spark.operators.textquality import _grams_col

WIN_K = 4  # gram length for winnowing
WIN_W = 8  # winnowing window (guarantee: matches >= W+K-1 tokens share a fingerprint)
MIX_ALPHA = 0.5  # temperature exponent; 0.5 = sqrt, which is
# correctly-rounded IEEE on both engines (pow is not), so the oracle
# hash-matches bit-for-bit


def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: hash every WIN_K-token gram,
    slide a WIN_W window over the hash sequence and keep each window's
    minimum — the classic guarantee that any shared run of at least
    W+K-1 tokens yields a shared fingerprint, at ~2/(W+1) sampling
    density.  Returns per-doc selected-fingerprint counts and extrema
    (the per-doc fingerprint SET is what a plagiarism/overlap index
    stores)."""
    docs = load_tables(spark, sf_dir)["documents"]
    grams = (
        docs.withColumn("toks", tokenize(F.lower(F.col("text"))))
        .select(
            "doc_id",
            F.size("toks").alias("n_toks"),
            F.posexplode(_grams_col(F.col("toks"), WIN_K)).alias("pos", "g"),
        )
        .select("doc_id", "n_toks", "pos", F.md5("g").alias("fp"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WIN_W - 1)
    )
    selected = (
        grams.withColumn("win_min", F.min("fp").over(w))
        # a full window exists only while pos + W <= n_grams
        .filter(F.col("pos") <= F.col("n_toks") - (WIN_K - 1) - WIN_W)
        .select("doc_id", F.col("win_min").alias("fp"))
        .distinct()
    )
    return (
        selected.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


WINNOWING_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, len(toks) AS n_toks,
         unnest([{{'pos': i - 1,
                   'fp': md5(array_to_string(toks[i:i+{WIN_K - 1}], ' '))}}
                 FOR i IN range(1, len(toks) - {WIN_K - 2})],
                recursive := true)
  FROM toks
), wins AS (
  SELECT doc_id, pos, n_toks,
         min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS win_min
  FROM grams
), selected AS (
  SELECT DISTINCT doc_id, win_min AS fp
  FROM wins WHERE pos <= n_toks - {WIN_K - 1} - {WIN_W}
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp, max(fp) AS max_fp
FROM selected GROUP BY doc_id ORDER BY doc_id
"""


def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting: each source's sampling
    weight is share^alpha renormalized (alpha=0.5 upweights the tail —
    the standard multilingual/multi-source pre-training trick).  Also
    reports the oversampling factor (weight / natural share): how many
    effective epochs of that source one natural epoch of the mixture
    consumes."""
    docs = load_tables(spark, sf_dir)["documents"]
    per_src = (
        docs.withColumn("n_tok", F.size(tokenize(F.lower(F.col("text")))))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per_src.agg(F.sum("n_tokens").cast("bigint").alias("tot_tokens"))
    shared = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("tot_tokens")
    )
    z = shared.agg(F.sum(F.sqrt("share")).alias("z"))
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("share", 6).alias("natural_share"),
            F.round(F.sqrt("share") / F.col("z"), 6).alias("weight"),
            F.round(F.sqrt("share") / F.col("z") / F.col("share"), 4).alias(
                "oversample_factor"
            ),
        )
        .orderBy("source")
    )


MIXTURE_WEIGHTS_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), shared AS (
  SELECT *, CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM per_src) AS share
  FROM per_src
), z AS (SELECT sum(sqrt(share)) AS z FROM shared)
SELECT source, n_docs, n_tokens,
       round(share, 6) AS natural_share,
       round(sqrt(share) / z, 6) AS weight,
       round(sqrt(share) / z / share, 4) AS oversample_factor
FROM shared, z ORDER BY source
"""


def doc_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of document token lengths with the
    cumulative document fraction — the first chart anyone draws before
    choosing a packing sequence length."""
    docs = load_tables(spark, sf_dir)["documents"]
    b = (
        docs.withColumn("n_tok", F.size(tokenize(F.lower(F.col("text")))))
        .filter(F.col("n_tok") > 0)
        .withColumn("bucket", F.pow(F.lit(2.0), F.floor(F.log2("n_tok"))).cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    tot = b.agg(F.sum("n_docs").cast("bigint").alias("tot"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the window runs over <= 64 bucket rows — a single tiny partition
    return (
        b.crossJoin(F.broadcast(tot))
        .withColumn("cum_docs", F.sum("n_docs").over(w).cast("bigint"))
        .select(
            "bucket",
            "n_docs",
            "n_tokens",
            F.round(F.col("cum_docs") / F.col("tot"), 6).alias("cum_doc_fraction"),
        )
        .orderBy("bucket")
    )


DOC_TOKEN_HISTOGRAM_SQL = """
WITH lens AS (
  SELECT len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS n_tok
  FROM documents
), b AS (
  SELECT CAST(pow(2.0, floor(log2(n_tok))) AS BIGINT) AS bucket,
         count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM lens WHERE n_tok > 0 GROUP BY 1
)
SELECT bucket, n_docs, n_tokens,
       round(CAST(sum(n_docs) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (SELECT sum(n_docs) FROM b), 6) AS cum_doc_fraction
FROM b ORDER BY bucket
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week, retention = fraction of the cohort active in each subsequent
    week.  Two uniform-key shuffles (user_id, then (cohort, week));
    cohort sizes broadcast back onto the matrix."""
    ev = load_tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("week"))
        .distinct()
        .join(firsts, "user_id")
        .withColumn(
            "week_offset", (F.datediff("week", "cohort_week") / 7).cast("int")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("timestamp_ntz").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_COHORTS_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), m AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM active a JOIN firsts f USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size FROM firsts GROUP BY 1
)
SELECT CAST(m.cohort_week AS TIMESTAMP) AS cohort_week, week_offset, n_active, cohort_size,
       round(CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention
FROM m JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix of the embedding table: the
    d(d+1)/2 upper-triangle entries via a posexplode² product-term
    aggregation — cov(i,j) = E[x_i·x_j] − E[x_i]·E[x_j].  All sums
    accumulate in DECIMAL so the result is bit-identical under any
    partitioning; only d² aggregated cells ever reach the driver.
    This is the building block for PCA whitening / decorrelation
    diagnostics over embedding columns."""
    # r14 2nd pass (guide §2.5): the scan is byte-small (1-2 splits)
    # and everything downstream — the d-row marginal aggregate AND the
    # N·d(d+1)/2-term product aggregation — inherited that
    # partitioning, so the heavy stage ran nearly single-task
    # (measured 5.5-6.5 s for the product agg alone; spread: ~1 s).
    emb = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["embeddings"],
        table_parquet_files(sf_dir, "embeddings"),
    )
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", F.col("x").cast("double").alias("x"))
    # r14 optimization (guide §1/§2.3): under uniform vector length
    # with no NULL components (the normal embedding-table shape), the
    # per-cell marginals are per-INDEX constants: sx(i,j) = S(i),
    # sy(i,j) = S(j), n(i,j) = N — so one d-row marginal aggregate
    # replaces 2/3 of the per-pair decimal casts+adds, and the
    # per-cell count drops entirely.  Decimal sums are
    # order-independent and exact, so the derived cells are
    # bit-identical to the original's; ragged or NULL-holed inputs
    # fall back to the original full per-cell aggregation.
    marg_rows = (
        comps.groupBy("i")
        .agg(
            F.sum(F.col("x").cast("decimal(30,12)")).alias("s"),
            F.count(F.lit(1)).alias("n_i"),
            F.count(F.when(F.col("x").isNull(), F.lit(1))).alias("null_i"),
        )
        .collect()
    )
    counts = {int(r["n_i"]) for r in marg_rows}
    uniform = (
        len(marg_rows) > 0
        and len(counts) == 1
        and all(int(r["null_i"]) == 0 for r in marg_rows)
    )
    if uniform:
        from icechunk_spark.engine import local_df

        n_total = counts.pop()
        # mean-per-index literals: double(decimal) cast then divide,
        # the exact ops the original ran per cell
        means = [
            {"idx": int(r["i"]), "m": float(r["s"]) / n_total} for r in marg_rows
        ]
        mi = broadcast(local_df(spark, means, "idx int, m double"))
        mj = broadcast(local_df(spark, means, "idx int, m double"))
        # r14 2nd pass: generate the upper-triangle product terms with
        # one flatten(transform²) over each row's array instead of the
        # comps self-join — the join built d² joined rows per vector
        # and discarded half at the i<=j filter (8.3 M rows at sf0.1,
        # 819 M at sf10).  embedding[i] is 0-based, cast chain
        # double·double → decimal(30,12) identical, so every term —
        # and the exact decimal sum — is unchanged (A/B'd
        # value-identical; tri vs spread join: 0.85 vs 1.0 s).
        # size>0 filter: a zero-length array produced no join rows;
        # sequence(0,-1) would DESCEND and index out of range.
        tri = emb.filter(F.size("embedding") > 0).select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(embedding)-1), i ->"
                    " transform(sequence(i, size(embedding)-1), j ->"
                    " struct(i AS i, j AS j,"
                    " CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)"
                    " AS decimal(30,12)) AS p))))"
                )
            ).alias("t")
        )
        prod = (
            tri.select("t.i", "t.j", "t.p")
            .groupBy("i", "j")
            .agg(F.sum("p").alias("sxy"))
        )
        return (
            prod.join(mi, prod["i"] == mi["idx"])
            .drop("idx")
            .withColumnRenamed("m", "mx")
            .join(mj, prod["j"] == mj["idx"])
            .drop("idx")
            .withColumnRenamed("m", "my")
            .select(
                "i",
                "j",
                F.round(
                    F.col("sxy").cast("double") / F.lit(n_total)
                    - F.col("mx") * F.col("my"),
                    8,
                ).alias("cov"),
            )
            .orderBy("i", "j")
        )
    pairs = (
        comps.alias("a")
        .join(comps.alias("b"), on="vec_id")
        .filter(F.col("a.i") <= F.col("b.i"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.sum((F.col("a.x") * F.col("b.x")).cast("decimal(30,12)")).alias("sxy"),
            F.sum(F.col("a.x").cast("decimal(30,12)")).alias("sx"),
            F.sum(F.col("b.x").cast("decimal(30,12)")).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return pairs.select(
        "i",
        "j",
        F.round(
            F.col("sxy").cast("double") / F.col("n")
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sy").cast("double") / F.col("n")),
            8,
        ).alias("cov"),
    ).orderBy("i", "j")


EMBEDDING_COVARIANCE_SQL = """
WITH comps AS (
  SELECT vec_id,
         unnest([{'i': i - 1, 'x': CAST(embedding[i] AS DOUBLE)}
                 FOR i IN range(1, len(embedding) + 1)],
                recursive := true)
  FROM embeddings
), pairs AS (
  SELECT a.i AS i, b.i AS j,
         sum(CAST(a.x * b.x AS DECIMAL(30,12))) AS sxy,
         sum(CAST(a.x AS DECIMAL(30,12))) AS sx,
         sum(CAST(b.x AS DECIMAL(30,12))) AS sy,
         count(*) AS n
  FROM comps a JOIN comps b USING (vec_id)
  WHERE a.i <= b.i GROUP BY 1, 2
)
SELECT i, j,
       round(CAST(sxy AS DOUBLE) / n
             - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 8) AS cov
FROM pairs ORDER BY i, j
"""


DSIR_B = 512  # hashed feature buckets
DSIR_ALPHA = 0.5  # Laplace smoothing
DSIR_TARGET = ("src0", "src1", "src2")  # the "target domain" sources


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al.,
    "Data Selection for Language Models via Importance Resampling"):
    hashed word-bigram features, per-bucket Laplace-smoothed
    probabilities under a target domain vs the raw corpus, and a
    per-document log importance weight sum(n_b * (ln p_t(b) - ln
    p_r(b))).  Reported per source: docs from target-like sources must
    surface with higher mean weights — the signal a 100 TB curation
    pass resamples on.

    Scale shape: one explode to bigrams, ONE groupBy (doc_id, bucket)
    with map-side combine, a B-row (512) log-ratio table broadcast
    back, per-doc and per-source aggregations.  No Python, no
    all-pairs anything; per-term rounding to DECIMAL makes the sums
    bit-identical under any partitioning (and to the oracle)."""
    # spread the byte-small documents scan (1-2 splits) so the
    # CPU-heavy tokenize+bigram+md5 explode runs on every core, not
    # 1-2 tasks (no-op at real scale — the minhash/lsh_quality
    # pattern)
    docs = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "text"),
        table_parquet_files(sf_dir, "documents"),
    )
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(_grams_col(tokenize(F.lower(F.col("text"))), 2)).alias("g"),
    )
    feat = grams.select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % DSIR_B).alias(
            "b"
        ),
    )
    # persist: the (doc, bucket) counts feed BOTH the bucket-total
    # branch and the per-doc weight join — without it the tokenize +
    # explode + first shuffle run twice (same pattern as minhash's
    # persisted signatures)
    dbc = (
        feat.groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    bc = dbc.groupBy("b").agg(
        F.sum(F.when(F.col("source").isin(*DSIR_TARGET), F.col("n")).otherwise(0)).alias("ct"),
        F.sum("n").alias("cr"),
    )
    tot = bc.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + DSIR_ALPHA) / (F.col("tt") + DSIR_ALPHA * DSIR_B))
            - F.log((F.col("cr") + DSIR_ALPHA) / (F.col("tr") + DSIR_ALPHA * DSIR_B))
        ).alias("lr"),
    )
    docw = (
        dbc.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.round(F.col("n") * F.col("lr"), 8).cast("decimal(28,8)")).alias(
                "logw"
            )
        )
    )
    return (
        docw.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # DECIMAL(24,10) intermediate before the 6-digit round:
            # kills cross-engine disagreement when the mean lands on a
            # half-point boundary (see ccnet_perplexity_buckets)
            F.round(
                (F.sum("logw").cast("double") / F.count(F.lit(1))).cast(
                    "decimal(24,10)"
                ),
                6,
            )
            .cast("double")
            .alias("mean_logw"),
            F.round(
                (
                    F.sum(F.when(F.col("logw") > 0, 1).otherwise(0))
                    / F.count(F.lit(1))
                ).cast("decimal(24,10)"),
                6,
            )
            .cast("double")
            .alias("pos_frac"),
        )
        .orderBy("source")
    )


def _dsir_sql() -> str:
    hex2int = " + ".join(
        f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    targets = ", ".join(f"'{s}'" for s in DSIR_TARGET)
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
  FROM toks WHERE len(toks) >= 2
), feat AS (
  SELECT doc_id, source, substr(md5(g), 1, 8) AS hh FROM grams
), featb AS (
  SELECT doc_id, source, ({hex2int}) % {DSIR_B} AS b FROM feat
), dbc AS (
  SELECT doc_id, source, b, count(*) AS n FROM featb GROUP BY 1, 2, 3
), bc AS (
  SELECT b,
         sum(CASE WHEN source IN ({targets}) THEN n ELSE 0 END) AS ct,
         sum(n) AS cr
  FROM dbc GROUP BY 1
), tot AS (
  SELECT sum(ct) AS tt, sum(cr) AS tr FROM bc
), lr AS (
  SELECT b,
         ln((ct + {DSIR_ALPHA}) / (tt + {DSIR_ALPHA * DSIR_B}))
         - ln((cr + {DSIR_ALPHA}) / (tr + {DSIR_ALPHA * DSIR_B})) AS lr
  FROM bc, tot
), docw AS (
  SELECT doc_id, source,
         sum(CAST(round(n * lr, 8) AS DECIMAL(28,8))) AS logw
  FROM dbc JOIN lr USING (b) GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(CAST(CAST(sum(logw) AS DOUBLE) / count(*) AS DECIMAL(24,10)), 6)
            AS DOUBLE) AS mean_logw,
       CAST(round(CAST(CAST(sum(CASE WHEN logw > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS DECIMAL(24,10)), 6) AS DOUBLE) AS pos_frac
FROM docw GROUP BY source ORDER BY source
"""


DSIR_SQL = _dsir_sql()


QUERIES = {
    "winnowing_fingerprint": winnowing_fingerprint,
    "dsir_importance": dsir_importance,
    "source_mixture_weights": source_mixture_weights,
    "doc_token_histogram": doc_token_histogram,
    "retention_cohorts": retention_cohorts,
    "embedding_covariance": embedding_covariance,
}

ORACLES = {
    "winnowing_fingerprint": WINNOWING_SQL,
    "dsir_importance": DSIR_SQL,
    "source_mixture_weights": MIXTURE_WEIGHTS_SQL,
    "doc_token_histogram": DOC_TOKEN_HISTOGRAM_SQL,
    "retention_cohorts": RETENTION_COHORTS_SQL,
    "embedding_covariance": EMBEDDING_COVARIANCE_SQL,
}
