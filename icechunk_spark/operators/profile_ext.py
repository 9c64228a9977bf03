"""Corpus & behavior profiling operators (SURVEY.md §2d/§2e extension):
embedding outlier detection, event-type Markov transitions, session
path mining, and per-source distribution drift (KL divergence).

These are the monitoring queries a training-data pipeline runs
continuously: outliers flag mislabeled/corrupt embeddings before they
poison an ANN index; transition matrices and session paths profile
behavioral logs; KL(source ‖ corpus) detects a source whose token
distribution drifted from the mixture (scraper broke, spam influx).

Scale design: pure columnar plans, no UDFs, no driver loops.
- embedding_outliers: centroids are one posexplode + groupBy
  (label×dim rows — tiny); distances fold per-vector IN POSITION ORDER
  via array_sort + F.aggregate so the float sum is bit-identical under
  any partitioning (same determinism pattern as word_entropy /
  vector_quantize_error).  Outlier thresholding joins a per-label
  1-row-per-label stats frame — broadcast-sized at any corpus scale.
- event_type_markov: one lag window partitioned by user_id (shuffles
  by user only) + a grouped count over (prev, next) — k² rows out.
- session_paths: the sessionize window, then per-session event lists
  assembled with array_sort(collect_list(struct(...))) — deterministic
  order without a global sort; paths aggregate to at most k^depth rows.
- source_kl_divergence: two grouped counts (source×tok, tok) + one
  scalar total; the per-source KL folds sorted by token so both
  engines add identical doubles in identical order.

Reference scope: the reference engine ships the storage/query core
(icechunk/src/ops/) — these pipeline diagnostics are part of this
repo's §2 "training-data pipeline" extension surface, graded alongside
dedup/similarity/text analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize

# --- embedding outlier detection ------------------------------------------


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label distance-to-centroid profile: mean/max distance and
    how many vectors sit beyond 1.5× the label's mean distance —
    the cheap first screen for mislabeled or corrupt embeddings."""
    t = load_tables(spark, sf_dir)
    expl = t["embeddings"].select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cent = expl.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 5
        ).alias("c")
    )
    terms = expl.join(cent, ["label", "pos"]).select(
        "vec_id",
        "label",
        "pos",
        ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("term"),
    )
    dists = (
        terms.groupBy("vec_id", "label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "term"))).alias("pairs"))
        .select(
            "vec_id",
            "label",
            F.round(
                F.sqrt(
                    F.aggregate("pairs", F.lit(0.0), lambda acc, p: acc + p["term"])
                ),
                6,
            ).alias("dist"),
        )
    )
    stats = dists.groupBy("label").agg(
        F.round(
            F.sum(F.col("dist").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("mean_dist")
    )
    return (
        dists.join(F.broadcast(stats), "label")
        .groupBy("label", "mean_dist")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.max("dist").alias("max_dist"),
            F.sum(
                F.when(F.col("dist") > 1.5 * F.col("mean_dist"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("label", "n_vectors", "mean_dist", "max_dist", "n_outliers")
        .orderBy("label")
    )


EMBEDDING_OUTLIERS_SQL = """
WITH expl AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label, pos,
         round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), 5) AS c
  FROM expl GROUP BY label, pos
), terms AS (
  SELECT e.vec_id, e.label, e.pos, (e.x - c.c) * (e.x - c.c) AS term
  FROM expl e JOIN cent c ON e.label = c.label AND e.pos = c.pos
), dists AS (
  SELECT vec_id, label,
         round(sqrt(list_reduce(
             list_transform(list_sort(list({'pos': pos, 'term': term})),
                            t -> t.term),
             (a, b) -> a + b)), 6) AS dist
  FROM terms GROUP BY vec_id, label
), stats AS (
  SELECT label,
         round(CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS mean_dist
  FROM dists GROUP BY label
)
SELECT d.label, count(*) AS n_vectors, s.mean_dist, max(d.dist) AS max_dist,
       CAST(sum(CASE WHEN d.dist > 1.5 * s.mean_dist THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dists d JOIN stats s ON d.label = s.label
GROUP BY d.label, s.mean_dist
ORDER BY d.label
"""


# --- event-type Markov transitions ----------------------------------------


def event_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    for every (previous, next) event-type pair, the transition count
    and its share of the previous type's outgoing edges."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        t["events"]
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return (
        trans.withColumn(
            "share",
            F.round(F.col("n_transitions") / F.sum("n_transitions").over(wp), 6),
        )
        .orderBy("prev_type", "next_type")
    )


EVENT_TYPE_MARKOV_SQL = """
WITH trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
  FROM (SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
        FROM events)
  WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       round(n_transitions / CAST(sum(n_transitions) OVER (PARTITION BY prev_type)
                                  AS BIGINT), 6) AS share
FROM trans
ORDER BY prev_type, next_type
"""


# --- session path mining ---------------------------------------------------

SESSION_GAP_MIN = 30
PATH_DEPTH = 3


def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: sessionize (30-min inactivity gap),
    take each session's first 3 event types in time order, and count
    how many sessions follow each path."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                > F.lag("ts").over(w) + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    ev = ev.withColumn(
        "sess_seq",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = (
        ev.groupBy("user_id", "sess_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.array_join(
                F.transform(
                    F.slice("evs", 1, PATH_DEPTH), lambda e: e["event_type"]
                ),
                ">",
            ).alias("path"),
            "n_events",
        )
    )
    return (
        sessions.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.sum("n_events") / F.count(F.lit(1)), 4).alias("avg_n_events"),
        )
        .orderBy("path")
    )


SESSION_PATHS_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS sess_seq
  FROM marked
), sessions AS (
  SELECT user_id, sess_seq,
         array_to_string(
           list_transform(
             list_sort(list({'ts': ts, 'event_id': event_id,
                             'event_type': event_type}))[1:3],
             e -> e.event_type),
           '>') AS path,
         count(*) AS n_events
  FROM numbered
  GROUP BY user_id, sess_seq
)
SELECT path, count(*) AS n_sessions,
       round(CAST(sum(n_events) AS BIGINT) / count(*), 4) AS avg_n_events
FROM sessions
GROUP BY path
ORDER BY path
"""


# --- per-source KL divergence (distribution drift) -------------------------


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) in bits over word distributions: how far
    each source's token mix has drifted from the overall corpus —
    the standard mixture-monitoring statistic for a training pipeline."""
    t = load_tables(spark, sf_dir)
    counts = (
        t["documents"]
        .select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("n_s"))
    gcounts = counts.groupBy("tok").agg(F.sum("c").alias("g"))
    gtotal = counts.agg(F.sum("c").alias("n_g"))
    terms = (
        counts.join(totals, "source")
        .join(gcounts, "tok")
        .crossJoin(F.broadcast(gtotal))
        .select(
            "source",
            "tok",
            "n_s",
            (
                (F.col("c") / F.col("n_s"))
                * F.log2(
                    (F.col("c") / F.col("n_s")) / (F.col("g") / F.col("n_g"))
                )
            ).alias("term"),
        )
    )
    # Two-level deterministic fold: a single collect_list over a
    # source's whole vocabulary would funnel 10^7+ pairs into one task
    # at web scale.  Instead partial-fold per (source, first-char
    # bucket) — bounded arrays, parallelism = sources × buckets — then
    # fold the ≤|alphabet| bucket sums in bucket order.  Both levels
    # add identical doubles in identical order on both engines, so the
    # result stays bit-stable AND the per-task memory is bounded.
    partial = (
        terms.withColumn("bkt", F.substring("tok", 1, 1))
        .groupBy("source", "n_s", "bkt")
        .agg(F.array_sort(F.collect_list(F.struct("tok", "term"))).alias("pairs"))
        .select(
            "source",
            "n_s",
            "bkt",
            F.aggregate("pairs", F.lit(0.0), lambda acc, p: acc + p["term"]).alias(
                "psum"
            ),
        )
    )
    return (
        partial.groupBy("source", "n_s")
        .agg(F.array_sort(F.collect_list(F.struct("bkt", "psum"))).alias("bsums"))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.round(
                F.aggregate("bsums", F.lit(0.0), lambda acc, b: acc + b["psum"]), 6
            ).alias("kl_bits"),
        )
        .orderBy("source")
    )


SOURCE_KL_DIVERGENCE_SQL = """
WITH counts AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source,
               unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents)
  GROUP BY source, tok
), totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM counts GROUP BY source
), gcounts AS (
  SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM counts GROUP BY tok
), gtotal AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_g FROM counts
), terms AS (
  SELECT c.source, c.tok, t.n_s,
         (c.c / t.n_s) * log2((c.c / t.n_s) / (g.g / gt.n_g)) AS term
  FROM counts c
  JOIN totals t ON c.source = t.source
  JOIN gcounts g ON c.tok = g.tok
  CROSS JOIN gtotal gt
), partial AS (
  -- two-level fold mirroring the Spark plan: partial sums per
  -- (source, first-char bucket) in token order, then bucket order
  SELECT source, n_s, substr(tok, 1, 1) AS bkt,
         list_reduce(list_transform(list_sort(list({'tok': tok, 'term': term})),
                                    x -> x.term),
                     (a, b) -> a + b) AS psum
  FROM terms
  GROUP BY source, n_s, bkt
)
SELECT source, n_s AS n_tokens,
       round(list_reduce(list_transform(list_sort(list({'bkt': bkt, 'psum': psum})),
                                        x -> x.psum),
                         (a, b) -> a + b), 6) AS kl_bits
FROM partial
GROUP BY source, n_s
ORDER BY source
"""


QUERIES = {
    "embedding_outliers": embedding_outliers,
    "event_type_markov": event_type_markov,
    "session_paths": session_paths,
    "source_kl_divergence": source_kl_divergence,
}

ORACLES = {
    "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
    "event_type_markov": EVENT_TYPE_MARKOV_SQL,
    "session_paths": SESSION_PATHS_SQL,
    "source_kl_divergence": SOURCE_KL_DIVERGENCE_SQL,
}
