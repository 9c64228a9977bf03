"""Training-data diagnostics operators (SURVEY.md §2e extension):
lexical-diversity stats, Zipf-law fit, event funnel conversion, and
neighbor-pair embedding similarity.

Scale design: everything is a pure columnar plan.  Per-source token
stats are one explode + two grouped aggregations (map-side combine
does the heavy lifting); the Zipf fit ranks only the top-N terms per
source (a bounded per-group sort) and computes the regression slope
from exact DECIMAL sums so the answer is bit-stable under any
partitioning; the funnel is three progressively-filtered min-ts
aggregations joined on user_id (no window over a global ordering);
embedding pairs come from an equi-join on vec_id+1 instead of a
single-partition global window, so pairing parallelizes with the
data.  No UDFs, no driver loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

# --- lexical diversity: type-token ratio + hapax fraction -----------------


def ttr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: type-token ratio (distinct words /
    words) and hapax fraction (words occurring once / distinct words) —
    the standard first-look diversity screen for a training corpus
    (low TTR = templated/duplicated text)."""
    t = load_tables(spark, sf_dir)
    counts = (
        t["documents"]
        .select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(F.col("n_hapax") / F.col("n_types"), 6).alias("hapax_frac"),
        )
        .orderBy("source")
    )


TTR_STATS_SQL = """
WITH counts AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source,
               unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents)
  GROUP BY source, tok
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(count(*) / CAST(sum(c) AS BIGINT), 6) AS ttr,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) / count(*), 6)
         AS hapax_frac
FROM counts
GROUP BY source
ORDER BY source
"""


# --- Zipf-law fit ---------------------------------------------------------

ZIPF_TOP_N = 100


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf fit: OLS slope of log2(freq) against log2(rank)
    over the top-N terms (natural text sits near -1; templated or
    synthetic text drifts).  The slope is computed from exact DECIMAL
    sums of the per-term doubles — decimal addition is associative, so
    the result is identical under any partitioning, and the oracle
    folds the same doubles (round 4 both sides)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    counts = (
        t["documents"]
        .select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    ranked = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ZIPF_TOP_N)
        .select(
            "source",
            F.log2("r").alias("x"),
            F.log2("c").alias("y"),
        )
    )
    dec = "decimal(28,15)"
    sums = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        sums.select("source", F.col("n").alias("n_terms"), F.round(slope, 4).alias("zipf_slope"))
        .orderBy("source")
    )


ZIPF_SLOPE_SQL = f"""
WITH counts AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source,
               unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents)
  GROUP BY source, tok
), ranked AS (
  SELECT source,
         log2(row_number() OVER (PARTITION BY source ORDER BY c DESC, tok ASC)) AS x,
         log2(c) AS y,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, tok ASC) AS r
  FROM counts
), sums AS (
  SELECT source,
         count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,15))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,15))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(28,15))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(28,15))) AS DOUBLE) AS sxy
  FROM ranked WHERE r <= {ZIPF_TOP_N}
  GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
FROM sums
ORDER BY source
"""


# --- event funnel ---------------------------------------------------------


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the events stream: view -> click (at or
    after the user's first view) -> purchase (at or after that first
    qualifying click), with stage conversion rates.  Three
    progressively-filtered min-ts aggregations joined on user_id —
    each stage shuffles only (user_id, ts), never a global window."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    totals = ev.agg(F.countDistinct("user_id").alias("n_users"))
    s1 = views.agg(F.count(F.lit(1)).alias("n_viewers"))
    s2 = clicks.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    s3 = purchases.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    # 1-row aggregate sides: explicit broadcast so the plan stays
    # BroadcastNestedLoopJoin even with AQE disabled (VERDICT r5 #7)
    return (
        totals.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(s3))
        .select(
            "n_users",
            "n_viewers",
            "n_click_after_view",
            "n_purchase_after_click",
            F.round(F.col("n_click_after_view") / F.col("n_viewers"), 6).alias(
                "view_to_click_rate"
            ),
            F.round(
                F.col("n_purchase_after_click") / F.col("n_click_after_view"), 6
            ).alias("click_to_purchase_rate"),
        )
    )


FUNNEL_SQL = """
WITH views AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), clicks AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t1
  GROUP BY e.user_id
), purchases AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM views) AS n_viewers,
       (SELECT count(*) FROM clicks) AS n_click_after_view,
       (SELECT count(*) FROM purchases) AS n_purchase_after_click,
       round((SELECT count(*) FROM clicks) / (SELECT count(*) FROM views), 6)
         AS view_to_click_rate,
       round((SELECT count(*) FROM purchases) / (SELECT count(*) FROM clicks), 6)
         AS click_to_purchase_rate
"""


# --- neighbor-pair embedding similarity -----------------------------------


def label_pair_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity of (vec_id, vec_id+1) embedding pairs, split
    by whether the two share a label — a cheap embedding-space sanity
    check (same-label pairs should score higher).  Pairs come from an
    equi-join on vec_id+1 (parallel, no global window); the cosine is
    an in-order JVM fold and the group average uses exact DECIMAL sums
    so the result is partitioning-independent."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    a = emb.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("label").alias("la"),
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("ida"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("lb"),
    )

    def fold_sq(col):
        return F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )

    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = a.join(b, "ida").select(
        (F.col("la") == F.col("lb")).alias("same_label"),
        (dot / (F.sqrt(fold_sq(F.col("ea"))) * F.sqrt(fold_sq(F.col("eb"))))).alias("cos"),
    )
    return (
        pairs.groupBy("same_label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("cos").cast("decimal(18,15)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cosine"),
        )
        .orderBy("same_label")
    )


_D_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip(ea, eb),"
    "   s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))),"
    " (a, b) -> a + b)"
)
_D_SQ_A = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(ea, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),"
    " (a, b) -> a + b)"
)
_D_SQ_B = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(eb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),"
    " (a, b) -> a + b)"
)

LABEL_PAIR_SIM_SQL = f"""
WITH pairs AS (
  SELECT a.label = b.label AS same_label,
         a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
), scored AS (
  SELECT same_label,
         {_D_DOT} / (sqrt({_D_SQ_A}) * sqrt({_D_SQ_B})) AS cos
  FROM pairs
)
SELECT same_label,
       count(*) AS n_pairs,
       round(CAST(sum(CAST(cos AS DECIMAL(18,15))) AS DOUBLE) / count(*), 6)
         AS avg_cosine
FROM scored
GROUP BY same_label
ORDER BY same_label
"""


QUERIES = {
    "ttr_stats": ttr_stats,
    "zipf_slope": zipf_slope,
    "funnel_conversion": funnel_conversion,
    "label_pair_similarity": label_pair_similarity,
}

ORACLES = {
    "ttr_stats": TTR_STATS_SQL,
    "zipf_slope": ZIPF_SLOPE_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "label_pair_similarity": LABEL_PAIR_SIM_SQL,
}


# --- PMI phrase mining ----------------------------------------------------

PMI_MIN_COUNT = 30


def pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase detection by pointwise mutual information over adjacent
    token pairs (the word2vec-phrases / gensim Phrases shape): bigrams
    whose corpus count clears PMI_MIN_COUNT, scored
    pmi = log2( p(xy) / (p(x) p(y)) ).  All inputs are exact integer
    counts, so the double arithmetic is bit-identical across engines
    and partitionings; two grouped aggregations + two broadcast scalar
    totals, no window, no Python."""
    from pyspark.sql.functions import broadcast

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(tokenize(F.col("text")).alias("toks"))
    uni = toks.select(F.explode("toks").alias("w"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    t1 = uni.agg(F.count(F.lit(1)).alias("t1"))
    t2 = bigrams.agg(F.count(F.lit(1)).alias("t2"))
    pmi = F.log2(
        (F.col("c12") / F.col("t2"))
        / ((F.col("c1") / F.col("t1")) * (F.col("c2") / F.col("t1")))
    )
    return (
        pair_counts.join(broadcast(uni_counts.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1")), "w1")
        .join(broadcast(uni_counts.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2")), "w2")
        .crossJoin(broadcast(t1))
        .crossJoin(broadcast(t2))
        .select("w1", "w2", "c12", F.round(pmi, 4).alias("pmi"))
        .orderBy("w1", "w2")
    )


PMI_PHRASES_SQL = f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), uni AS (
  SELECT unnest(toks) AS w FROM toks
), bigrams AS (
  SELECT z[1] AS w1, z[2] AS w2
  FROM (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z
        FROM toks WHERE len(toks) >= 2)
), uni_counts AS (
  SELECT w, count(*) AS cw FROM uni GROUP BY w
), pair_counts AS (
  SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2
  HAVING count(*) >= {PMI_MIN_COUNT}
), t1 AS (SELECT count(*) AS t1 FROM uni),
   t2 AS (SELECT count(*) AS t2 FROM bigrams)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       round(log2((CAST(c12 AS BIGINT) / CAST(t2 AS BIGINT))
             / ((CAST(u1.cw AS BIGINT) / CAST(t1 AS BIGINT))
                * (CAST(u2.cw AS BIGINT) / CAST(t1 AS BIGINT)))), 4) AS pmi
FROM pair_counts
JOIN uni_counts u1 ON pair_counts.w1 = u1.w
JOIN uni_counts u2 ON pair_counts.w2 = u2.w
CROSS JOIN t1 CROSS JOIN t2
ORDER BY w1, w2
"""


# --- event inter-arrival stats --------------------------------------------


def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics over each user's own
    event stream (burstiness / traffic-shape diagnostic).  The lag
    window partitions on (user_id, event_type) — parallelism scales
    with users, never a per-type global sort — and the mean/std come
    from exact DECIMAL sums of integer microsecond gaps, so results
    are partitioning-independent."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("us").over(w))
        .filter(F.col("prev").isNotNull())
        .select("event_type", (F.col("us") - F.col("prev")).alias("gap_us"))
    )
    dec = "decimal(38,0)"
    # square AFTER the decimal cast: a microsecond gap spanning the
    # dataset period squares past the LONG range
    sums = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_us").cast(dec)).cast("double").alias("s"),
        F.sum(F.col("gap_us").cast(dec) * F.col("gap_us").cast(dec))
        .cast("double")
        .alias("sq"),
    )
    mean_s = F.col("s") / F.col("n_gaps") / F.lit(1e6)
    var_us = F.col("sq") / F.col("n_gaps") - (F.col("s") / F.col("n_gaps")) * (
        F.col("s") / F.col("n_gaps")
    )
    return (
        sums.select(
            "event_type",
            "n_gaps",
            F.round(mean_s, 6).alias("mean_gap_s"),
            F.round(F.sqrt(var_us) / F.lit(1e6), 6).alias("std_gap_s"),
        )
        .orderBy("event_type")
    )


EVENT_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
), sums AS (
  SELECT event_type,
         count(*) AS n_gaps,
         CAST(sum(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(sum(CAST(gap_us AS DECIMAL(38,0)) * CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS sq
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       n_gaps,
       round(s / n_gaps / 1e6, 6) AS mean_gap_s,
       round(sqrt(sq / n_gaps - (s / n_gaps) * (s / n_gaps)) / 1e6, 6) AS std_gap_s
FROM sums
ORDER BY event_type
"""


QUERIES.update(
    {
        "pmi_phrases": pmi_phrases,
        "event_interarrival_stats": event_interarrival_stats,
    }
)
ORACLES.update(
    {
        "pmi_phrases": PMI_PHRASES_SQL,
        "event_interarrival_stats": EVENT_INTERARRIVAL_SQL,
    }
)


# --- dedup cluster size distribution --------------------------------------


def cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the standard dedup report
    ("how much of the corpus sits in clusters of size k").  Composes
    the connected-components operator: one extra double aggregation
    on top of dedup_cluster's labels; the oracle wraps the same
    recursive-CTE twin."""
    from icechunk_spark.operators.dedup import dedup_cluster

    labels = dedup_cluster(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("size")
    )


def _body(sql: str) -> str:
    """An oracle query with its trailing ORDER BY stripped, usable as
    a derived table."""
    return sql.rsplit("ORDER BY", 1)[0]


def _cluster_size_sql() -> str:
    from icechunk_spark.operators.dedup import DEDUP_CLUSTER_SQL

    return f"""
SELECT size, count(*) AS n_clusters
FROM (SELECT cluster_id, count(*) AS size
      FROM ({_body(DEDUP_CLUSTER_SQL)})
      GROUP BY cluster_id)
GROUP BY size
ORDER BY size
"""


# --- train/val leakage ----------------------------------------------------


def split_leakage_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-integrity check: fraction of validation documents whose
    content fingerprint also appears in the train split (a leaked val
    doc invalidates eval).  Composes the deterministic hash split with
    the rolling-hash fingerprint — a distinct-fp semi-join, counts
    only."""
    from pyspark.sql.functions import broadcast

    from icechunk_spark.operators.pipeline_ext import split_train_val
    from icechunk_spark.operators.textstats import fingerprint

    splits = split_train_val(spark, sf_dir).select("doc_id", "split")
    j = splits.join(fingerprint(spark, sf_dir), "doc_id")
    train_fps = j.filter(F.col("split") == "train").select("fp").distinct()
    val = j.filter(F.col("split") == "val")
    leaked = val.join(train_fps, "fp").select("doc_id").distinct()
    n_train = j.filter(F.col("split") == "train").agg(F.count(F.lit(1)).alias("n_train"))
    n_val = val.agg(F.count(F.lit(1)).alias("n_val"))
    n_leak = leaked.agg(F.count(F.lit(1)).alias("n_leaked_val"))
    return (
        n_train.crossJoin(broadcast(n_val))
        .crossJoin(broadcast(n_leak))
        .select(
            "n_train",
            "n_val",
            "n_leaked_val",
            F.round(F.col("n_leaked_val") / F.col("n_val"), 6).alias("leakage_rate"),
        )
    )


def _split_leakage_sql() -> str:
    from icechunk_spark.operators.pipeline_ext import SPLIT_SQL
    from icechunk_spark.operators.textstats import FINGERPRINT_SQL

    return f"""
WITH sp AS ({_body(SPLIT_SQL)}),
     fp AS ({_body(FINGERPRINT_SQL)}),
     j AS (SELECT sp.doc_id AS doc_id, split, fp FROM sp JOIN fp ON sp.doc_id = fp.doc_id),
     tr AS (SELECT DISTINCT fp FROM j WHERE split = 'train'),
     leaked AS (SELECT DISTINCT j.doc_id FROM j JOIN tr USING (fp) WHERE split = 'val')
SELECT (SELECT count(*) FROM j WHERE split = 'train') AS n_train,
       (SELECT count(*) FROM j WHERE split = 'val') AS n_val,
       (SELECT count(*) FROM leaked) AS n_leaked_val,
       round((SELECT count(*) FROM leaked) / (SELECT count(*) FROM j WHERE split = 'val'), 6)
         AS leakage_rate
"""


QUERIES.update(
    {
        "cluster_size_distribution": cluster_size_distribution,
        "split_leakage_rate": split_leakage_rate,
    }
)
ORACLES.update(
    {
        "cluster_size_distribution": _cluster_size_sql(),
        "split_leakage_rate": _split_leakage_sql(),
    }
)
