"""Corpus refinement / selection operators (SURVEY.md §2d/§2e
extension): C4-style clean-text reassembly, per-source quantile
normalization of quality scores, exponential time-decay engagement
scoring, and MMR (maximal-marginal-relevance) diversified top-k
retrieval.

These close the gap between SCORING a corpus (textquality,
curation_ext) and acting on it: clean_reassemble materializes the
deduplicated text a line-level filter implies (line_dedup only
reports the statistics), quality_quantile_norm turns raw heuristic
scores into cross-source-comparable ranks (raw score distributions
differ per source, so a global threshold over-prunes some sources —
the normalization every mixture builder applies first),
event_decay_score is the standard recency-weighted engagement
aggregate, and mmr_diversify is the diversity-aware re-ranking step
retrieval pipelines run after ANN shortlisting (Carbonell & Goldstein
1998).

Scale design:
- clean_reassemble is line_dedup's plan plus the reassembly: one
  window over the line-hash shuffle, one per-doc aggregate.  The line
  TEXT must move through the per-doc shuffle here (it is the output);
  line_dedup stays the cheap stats-only variant that moves hashes.
- quality_quantile_norm is one scoring scan plus one window over
  (source) — the partition key is low-cardinality but each partition
  is only sorted, not materialized per-row quadratically; at 100 TB
  swap the exact percent_rank for a sampled CDF join (same output
  contract, documented below).
- event_decay_score is one (user_id) shuffle with map-side combine on
  the collect_list; per-user event counts are bounded in practice.
  The fold is array_sort-ordered so the float sum is bit-stable (the
  word_entropy pattern).
- mmr_diversify runs its O(n) relevance scan + top-M shortlist
  DISTRIBUTED (TakeOrderedAndProject — no global sort materialized),
  then the O(M·K·dim) greedy on the driver over a CONSTANT-size
  M×dim matrix — the kmeans_clusters contract: only a bounded
  shortlist ever reaches the driver, never the vector table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.engine import local_df
from icechunk_spark.functions import dot, ensure_min_partitions_files, l2_norm
from icechunk_spark.operators.linedup import DUCK_LINES, lines_col
from icechunk_spark.operators.similarity import DIM, N_QUERIES
from icechunk_spark.operators.textstats import QUALITY_SQL, quality_score

# --- C4-style clean-text reassembly ---------------------------------------


def clean_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize what line-level dedup implies: per document, drop
    every line that already occurred earlier in the corpus (first
    occurrence = lexicographic min (doc_id, line_idx) within the
    line's hash group) and fingerprint the REASSEMBLED kept text.
    line_dedup reports the statistics; this produces the artifact a
    cleaning pipeline actually writes.  Documents whose every line is
    a duplicate reassemble to nothing: clean_fp is NULL."""
    t = load_tables(spark, sf_dir)
    ln = t["documents"].select(
        "doc_id", F.posexplode(lines_col(F.col("text"))).alias("line_idx", "line")
    )
    w = Window.partitionBy(F.md5("line"))
    kept = (
        F.min(F.struct("doc_id", "line_idx")).over(w)
        == F.struct("doc_id", "line_idx")
    ).cast("int")
    # collect_list skips the NULL the when() leaves on dropped lines;
    # array_sort restores line order so concat is deterministic
    ks = F.array_sort(
        F.collect_list(
            F.when(F.col("kept") == 1, F.struct("line_idx", "line"))
        )
    )
    return (
        ln.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("kept").alias("kept_lines"),
            ks.alias("ks"),
        )
        .select(
            "doc_id",
            "n_lines",
            "kept_lines",
            F.when(
                F.col("kept_lines") > 0,
                F.md5(F.concat_ws(" ", F.transform("ks", lambda p: p["line"]))),
            ).alias("clean_fp"),
        )
        .orderBy("doc_id")
    )


# DUCK_LINES defines the identical line segmentation for the oracle.
CLEAN_REASSEMBLE_SQL = f"""
WITH {DUCK_LINES},
marked AS (
  SELECT doc_id, line_idx, line,
         CAST(row_number() OVER (PARTITION BY md5(line)
                                 ORDER BY doc_id, line_idx) = 1 AS INT) AS kept
  FROM lines
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS kept_lines,
       md5(string_agg(line, ' ' ORDER BY line_idx)
             FILTER (WHERE kept = 1)) AS clean_fp
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""


# --- per-source quantile normalization ------------------------------------


def quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percent-rank normalization of the heuristic quality
    score: raw score distributions differ per source (a books source
    skews long, a forum source short), so a single global threshold
    over-prunes some sources.  q_norm rescales each document to its
    within-source quantile; decile is the bucketed form a mixture
    builder samples from.

    Ordering inside each source is (quality, doc_id) — total, so
    percent_rank is deterministic.  100 TB contract: the window sorts
    each source partition once (no per-row quadratic work); if one
    source dominates the corpus, swap the exact percent_rank for a
    sampled-CDF broadcast join with the same output columns."""
    t = load_tables(spark, sf_dir)
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    j = t["documents"].select("doc_id", "source").join(q, "doc_id")
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    pct = F.percent_rank().over(w)
    return (
        j.select(
            "doc_id",
            "source",
            "quality",
            F.round(pct, 4).alias("q_norm"),
            F.least(F.floor(pct * 10), F.lit(9)).cast("int").alias("decile"),
        )
        .orderBy("doc_id")
    )


QUALITY_QUANTILE_SQL = f"""
WITH q AS ({QUALITY_SQL}),
j AS (
  SELECT d.doc_id, d.source, q.quality
  FROM documents d JOIN q USING (doc_id)
)
SELECT doc_id, source, quality,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id), 4) AS q_norm,
       CAST(least(floor(percent_rank() OVER (PARTITION BY source
                                             ORDER BY quality, doc_id) * 10),
                  9) AS INT) AS decile
FROM j
ORDER BY doc_id
"""


# --- exponential time-decay engagement ------------------------------------

TAU_DAYS = 7
TAU_US = TAU_DAYS * 86_400 * 1_000_000  # decay constant, microseconds


def event_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement per user: sum of value·exp(-Δt/τ)
    with τ = TAU_DAYS days, Δt measured back from the newest event in
    the table.  The standard freshness-weighted activity score behind
    churn/engagement ranking.

    Time is integer MICROSECONDS end-to-end (unix_micros here,
    epoch_us in the oracle) so Δt is exact in both engines; the fold
    is array_sort-ordered by (ts, event_id) so the float sum is
    bit-stable across partitionings.  One (user_id) shuffle; the
    1-row t_ref aggregate is broadcast."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    tref = ev.agg(F.max(te).alias("tref_us"))
    decay = F.aggregate(
        "ss",
        F.lit(0.0),
        lambda acc, s: acc
        + s["v"]
        * F.exp(-((F.col("tref_us") - s["te"]).cast("double") / F.lit(float(TAU_US)))),
    )
    return (
        ev.select(
            "user_id",
            F.struct(
                te.alias("te"), F.col("event_id").alias("eid"), F.col("value").alias("v")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list("s")).alias("ss"),
        )
        .crossJoin(broadcast(tref))
        .select(
            "user_id",
            "n_events",
            F.round(decay, 4).alias("decay_score"),
        )
        .orderBy("user_id")
    )


EVENT_DECAY_SQL = f"""
WITH tr AS (SELECT max(epoch_us(ts)) AS tref_us FROM events),
u AS (
  SELECT user_id, count(*) AS n_events,
         list_sort(list({{'te': epoch_us(ts), 'eid': event_id, 'v': value}})) AS ss
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(ss, s -> s.v *
                 exp(-(CAST(tref_us - s.te AS DOUBLE) / {TAU_US}.0)))),
             (x, y) -> x + y), 4) AS decay_score
FROM u, tr
ORDER BY user_id
"""


# --- MMR diversified top-k -------------------------------------------------

MMR_QUERY_ID = 0
MMR_SHORTLIST = 50  # M: relevance shortlist size (the distributed part)
MMR_K = 10  # selections returned
MMR_LAMBDA = 0.7  # relevance vs diversity trade-off
# the diversity weight as its OWN decimal literal: both engines parse
# "0.3" to the same double, whereas computing 1.0 - 0.7 in floats
# yields 0.30000000000000004 — one ulp off the SQL literal
MMR_DIV = 0.3


def _dround(x: float, d: int) -> float:
    """DuckDB-compatible round: scale, round half away from zero,
    unscale — all in float64, mirroring DuckDB's round(DOUBLE, k) so
    the greedy tie-break sees identical keys in both engines."""
    p = 10.0 ** d
    v = x * p
    f = math.floor(v)
    r = v - f
    if r > 0.5 or (r == 0.5 and v > 0):
        f += 1.0
    return f / p


def _sdot(a: list[float], b: list[float]) -> float:
    """Strict sequential left fold — the same addition order as the
    distributed functions.dot and the oracle's list_reduce, so driver-
    side similarities are bit-identical to both."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick MMR_K vectors maximizing
    λ·rel(q, v) − (1−λ)·max_{c∈chosen} cos(v, c) from the top-
    MMR_SHORTLIST relevance candidates for query MMR_QUERY_ID — the
    diversity-aware selection step retrieval/curation pipelines run
    after ANN shortlisting (near-duplicate hits waste shortlist
    slots; MMR spends them on coverage).

    Distribution contract: the O(n·dim) relevance scan and the top-M
    cut run distributed (TakeOrderedAndProject — per-partition top-M,
    merged on the driver, no global sort); only the M×dim shortlist
    reaches the driver, where the O(M·K·dim) greedy is constant-size
    (the kmeans_clusters pattern).  Argmax keys round to 6 decimals
    with a vec_id tie-break in both engines, so the greedy sequence
    is deterministic."""
    t = load_tables(spark, sf_dir)
    emb = ensure_min_partitions_files(
        t["embeddings"], table_parquet_files(sf_dir, "embeddings")
    ).withColumn(
        "nb", l2_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("qe"), F.col("nb").alias("nq")
    )
    shortlist = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(broadcast(q))
        .select(
            "vec_id",
            (dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb"))).alias(
                "rel"
            ),
            F.transform("embedding", lambda x: x.cast("double") / F.col("nb")).alias(
                "nv"
            ),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_SHORTLIST)
        .collect()
    )
    cands = [
        (int(r["vec_id"]), float(r["rel"]), [float(x) for x in r["nv"]])
        for r in shortlist
    ]
    cands.sort(key=lambda c: c[0])
    chosen_vecs: list[list[float]] = []
    chosen_ids: set[int] = set()
    out: list[tuple[int, int, float]] = []
    for step in range(1, min(MMR_K, len(cands)) + 1):
        best = None
        for vid, rel, nv in cands:
            if vid in chosen_ids:
                continue
            if chosen_vecs:
                score = MMR_LAMBDA * rel - MMR_DIV * max(
                    _sdot(nv, c) for c in chosen_vecs
                )
            else:
                score = rel
            key = (-_dround(score, 6), vid)
            if best is None or key < best[0]:
                best = (key, vid, score, nv)
        _, vid, score, nv = best
        chosen_ids.add(vid)
        chosen_vecs.append(nv)
        out.append((step, vid, _dround(score, 4)))
    # local_df → LocalRelation: no RDD path, no Spark job for K rows
    return local_df(spark, out, "rnk int, vec_id bigint, mmr_score double")


def _mmr_sql() -> str:
    fold = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "[{ab} FOR i IN range(1, " + str(DIM + 1) + ")]), (x, y) -> x + y)"
    ).format
    zdot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip(s.nv, c), p -> p[1] * p[2])), (x, y) -> x + y)"
    )
    self_norm = fold(
        ab="CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)"
    )
    return f"""
WITH RECURSIVE q AS (
  SELECT embedding AS qe, sqrt({self_norm}) AS nq
  FROM embeddings WHERE vec_id = {MMR_QUERY_ID}
), short AS (
  SELECT e.vec_id,
         {fold(ab="CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)")}
           / (nb * q.nq) AS rel,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE) / nb) AS nv
  FROM (SELECT vec_id, embedding, sqrt({self_norm}) AS nb
        FROM embeddings WHERE vec_id >= {N_QUERIES}) e, q
  ORDER BY rel DESC, e.vec_id LIMIT {MMR_SHORTLIST}
), sel AS (
  SELECT 1 AS step, [s.vec_id] AS ids, [s.nv] AS vecs, [round(s.rel, 4)] AS scores
  FROM (SELECT * FROM short ORDER BY round(rel, 6) DESC, vec_id LIMIT 1) s
  UNION ALL
  SELECT step + 1, list_append(ids, pick.vec_id),
         list_append(vecs, pick.nv), list_append(scores, round(pick.mmr, 4))
  FROM sel, LATERAL (
    SELECT * FROM (
      SELECT s.vec_id AS vec_id, s.nv AS nv,
             {MMR_LAMBDA} * s.rel - {MMR_DIV} *
               list_max(list_transform(sel.vecs, c -> {zdot})) AS mmr
      FROM short s
      WHERE NOT list_contains(sel.ids, s.vec_id)
    ) ORDER BY round(mmr, 6) DESC, vec_id LIMIT 1
  ) pick
  WHERE sel.step < {MMR_K}
)
SELECT CAST(u.rnk AS INT) AS rnk, ids[u.rnk] AS vec_id, scores[u.rnk] AS mmr_score
FROM sel, LATERAL (SELECT unnest(range(1, step + 1)) AS rnk) u
WHERE step = {MMR_K}
ORDER BY rnk
"""


MMR_DIVERSIFY_SQL = _mmr_sql()


# --- farthest-point sampling -------------------------------------------

FPS_K = 10  # samples returned
#: driver fast-path pool bound (the negatives_ann 65k precedent);
#: larger pools keep the fully distributed per-round argmax
FPS_DRIVER_CAP = 65_536


def _fps_driver_fast_path(spark: SparkSession, pool: DataFrame):
    """Bounded-pool FPS on the driver, bit-identical to the
    distributed rounds (see fps_sample docstring); returns None when
    the pool exceeds FPS_DRIVER_CAP or contains non-finite normalized
    components (both keep the distributed path)."""
    import numpy as np

    # limit(CAP+1) either returns the whole pool or proves it exceeds
    # the bound in one job (the BPE-trainer pattern)
    pdf = pool.limit(FPS_DRIVER_CAP + 1).toPandas()
    if len(pdf) > FPS_DRIVER_CAP or len(pdf) == 0:
        return None
    vec_ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["nv"].to_numpy()).astype(np.float64)
    if not np.isfinite(mat).all():
        return None
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round6(x: float) -> Decimal:
        return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)

    order = np.argsort(vec_ids, kind="stable")
    vec_ids, mat = vec_ids[order], mat[order]
    n = len(vec_ids)
    seed_idx = 0  # smallest vec_id
    chosen_mask = np.zeros(n, dtype=bool)
    chosen_mask[seed_idx] = True
    out: list[tuple[int, int, float | None]] = [(1, int(vec_ids[seed_idx]), None)]
    # dmin starts from the seed's distances; each later round folds in
    # ONE new dot column.  cumsum's last element IS the strict left
    # fold the JVM aggregate computes, and np.minimum equals F.least
    # on finite doubles.
    dmin = 1.0 - np.cumsum(mat * mat[seed_idx][None, :], axis=1)[:, -1]
    for step in range(2, FPS_K + 1):
        # tie-break on (round(d,6) DESC, vec_id ASC) over non-chosen
        avail = ~chosen_mask
        raw = np.where(avail, dmin, -np.inf)
        m = raw.max()
        # candidates whose ROUNDED value could equal the rounded max:
        # rounding moves a double by < 1e-6, so anything below
        # m - 2e-6 cannot win
        cand = np.flatnonzero(raw >= m - 2e-6)
        best_key = None
        best_i = -1
        for i in cand:
            key = (spark_round6(float(dmin[i])), -int(vec_ids[i]))
            if best_key is None or key > best_key:
                best_key, best_i = key, int(i)
        chosen_mask[best_i] = True
        out.append((step, int(vec_ids[best_i]), _dround(float(dmin[best_i]), 4)))
        if step < FPS_K:
            dnew = 1.0 - np.cumsum(mat * mat[best_i][None, :], axis=1)[:, -1]
            dmin = np.minimum(dmin, dnew)
    return local_df(spark, out, "rnk int, vec_id bigint, min_dist double")


def fps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (k-center greedy) sampling over the embedding
    pool: start from the lowest vec_id, then repeatedly add the vector
    maximizing its cosine distance to the NEAREST already-chosen
    vector — the classic 2-approximation coreset / diversity-sampling
    pass a curation pipeline runs to seed clustering or pick
    annotation batches (Gonzalez 1985; SemDeDup/SSL-prototypes use the
    same geometry).

    Unlike mmr_diversify (shortlist → driver greedy), each of the
    FPS_K-1 selection rounds here is a DISTRIBUTED argmax over the
    whole pool: the chosen set enters the scan as literal arrays
    (k·dim constants — broadcast-by-expression), the min-distance is a
    F.least fold over them, and only the 1-row argmax is collected per
    round.  O(K) scans, no pairwise join, nothing driver-side grows
    with the pool."""
    t = load_tables(spark, sf_dir)
    emb = ensure_min_partitions_files(
        t["embeddings"], table_parquet_files(sf_dir, "embeddings")
    ).withColumn(
        "nb", l2_norm(F.col("embedding"))
    )
    pool = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / F.col("nb")).alias(
                "nv"
            ),
        )
        .persist()
    )
    # r14 fast path (the BPE-trainer bounded-aggregate pattern): the
    # K-round distributed argmax costs K sequential job floors —
    # 3.9 s at sf0.1 for 10 rounds over a 2k-row pool.  When the pool
    # fits the same 65k driver cap negatives_ann uses, ONE Arrow
    # collect + a numpy/Decimal greedy reproduces the identical
    # selection: products and the strict left-fold dot via
    # np.cumsum (sequential by construction), min-distance via
    # np.minimum (exact for non-NaN doubles), and the Spark tie-break
    # round(d, 6) via Decimal HALF_UP (the repo's established F.round
    # mirror).  Non-finite norms (a zero vector would make nv NaN/Inf
    # and Spark's NaN ordering diverge from numpy's) fall back to the
    # distributed rounds, as does any pool over the cap.
    fast = _fps_driver_fast_path(spark, pool)
    if fast is not None:
        pool.unpersist()
        return fast
    seed = pool.orderBy("vec_id").limit(1).collect()[0]
    chosen: list[tuple[int, list[float]]] = [
        (int(seed["vec_id"]), [float(x) for x in seed["nv"]])
    ]
    out: list[tuple[int, int, float | None]] = [(1, chosen[0][0], None)]
    for step in range(2, FPS_K + 1):
        dists = [
            F.lit(1.0) - dot(F.col("nv"), F.array(*[F.lit(v) for v in cv]))
            for _, cv in chosen
        ]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        pick = (
            pool.filter(~F.col("vec_id").isin([cid for cid, _ in chosen]))
            .select("vec_id", "nv", mind.alias("d"))
            .orderBy(F.desc(F.round(F.col("d"), 6)), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((int(pick["vec_id"]), [float(x) for x in pick["nv"]]))
        out.append((step, chosen[-1][0], _dround(float(pick["d"]), 4)))
    pool.unpersist()
    return local_df(spark, out, "rnk int, vec_id bigint, min_dist double")


def _fps_sql() -> str:
    self_norm = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "[CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) "
        f"FOR i IN range(1, {DIM + 1})]), (x, y) -> x + y)"
    )
    zdot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(list_zip(s.nv, c), p -> p[1] * p[2])), (x, y) -> x + y)"
    )
    return f"""
WITH RECURSIVE pool AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nb) AS nv
  FROM (SELECT vec_id, embedding, sqrt({self_norm}) AS nb
        FROM embeddings WHERE vec_id >= {N_QUERIES})
), sel AS (
  SELECT 1 AS step, [s.vec_id] AS ids, [s.nv] AS vecs,
         [CAST(NULL AS DOUBLE)] AS dists
  FROM (SELECT * FROM pool ORDER BY vec_id LIMIT 1) s
  UNION ALL
  SELECT step + 1, list_append(ids, pick.vec_id),
         list_append(vecs, pick.nv), list_append(dists, round(pick.d, 4))
  FROM sel, LATERAL (
    SELECT * FROM (
      SELECT s.vec_id AS vec_id, s.nv AS nv,
             list_min(list_transform(sel.vecs, c -> 1.0 - {zdot})) AS d
      FROM pool s
      WHERE NOT list_contains(sel.ids, s.vec_id)
    ) ORDER BY round(d, 6) DESC, vec_id LIMIT 1
  ) pick
  WHERE sel.step < {FPS_K}
)
SELECT CAST(u.rnk AS INT) AS rnk, ids[u.rnk] AS vec_id, dists[u.rnk] AS min_dist
FROM sel, LATERAL (SELECT unnest(range(1, step + 1)) AS rnk) u
WHERE step = {FPS_K}
ORDER BY rnk
"""


FPS_SAMPLE_SQL = _fps_sql()


QUERIES = {
    "clean_reassemble": clean_reassemble,
    "quality_quantile_norm": quality_quantile_norm,
    "event_decay_score": event_decay_score,
    "mmr_diversify": mmr_diversify,
    "fps_sample": fps_sample,
}

ORACLES = {
    "clean_reassemble": CLEAN_REASSEMBLE_SQL,
    "quality_quantile_norm": QUALITY_QUANTILE_SQL,
    "event_decay_score": EVENT_DECAY_SQL,
    "mmr_diversify": MMR_DIVERSIFY_SQL,
    "fps_sample": FPS_SAMPLE_SQL,
}
