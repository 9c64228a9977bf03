"""Similarity search over the embeddings table (SURVEY.md §2d):
brute-force cosine top-k (the exactness baseline), random-hyperplane
LSH, and an IVF-style coarse-quantizer ANN (the scale paths).

Scale design:
- Brute force broadcasts the (small) query set against the full vector
  table: one pass, no shuffle of the big side; per-query top-k via a
  window over (query, rounded-cos, id).  At 100 TB you'd cap queries
  per pass and use mapPartitions-local heaps; semantics identical.
- LSH: bucket = sign bits of projections onto deterministic
  pseudo-random hyperplanes (derived from md5, no RNG state), join on
  bucket — candidates per query ≈ n / 2^bits.
- IVF: coarse centroids (deterministic sample), assign each vector to
  its nearest centroid (JVM-side argmax over a literal centroid
  array), probe the query's top cells only.
- Cosine is a sequential left-fold in both engines (F.aggregate vs
  list_reduce) so doubles match bit-for-bit in the oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import (
    cosine,
    dot,
    ensure_min_partitions_files,
    l2_norm,
    money_avg,
)
from icechunk_spark.operators.pairblocks import (
    PAIR_FAST_MIN_ROWS,
    PAIRWISE_KERNEL_SCHEMA,
    block_pair_tasks,
    emb_rows,
    packed_blocks,
    pairwise_topk_kernel,
)

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
DIM = 64


def _fold_cosine(a: Column, b: Column) -> Column:
    """Cosine with deterministic left-fold summation (oracle-exact)."""
    return cosine(a, b)


def _partial_topk(df: DataFrame, keys: list[str], order: list[Column], k: int) -> DataFrame:
    """Top-k per key group in two stages: a per-input-partition rank
    (parallelism = n_keys x n_partitions) keeps only each partition's
    local top-k, then the global rank runs over <= k x n_partitions
    rows per key.  A single global window would collapse the rank
    stage to n_keys tasks each sorting the full candidate set — with
    10 query vectors that is 10 tasks regardless of cluster size.
    Any global top-k row is necessarily in its partition's local
    top-k, so the result is exactly the global top-k; ties stay
    deterministic because ``order`` totally orders rows."""
    pre = Window.partitionBy(*keys, "__pid").orderBy(*order)
    final = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__prnk", F.row_number().over(pre))
        .filter(F.col("__prnk") <= k)
        .withColumn("rnk", F.row_number().over(final).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .drop("__pid", "__prnk")
    )


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector.

    Hot-loop discipline (the pair stage runs n_vectors × n_queries
    times): each side's L2 norm is computed ONCE per row BEFORE the
    join — not per pair — and the per-pair dot product is the
    statically unrolled strict left fold (functions.unrolled_dot),
    bit-identical to the generic fold so the list_reduce oracle still
    hash-matches, but inlined by whole-stage codegen instead of
    interpreting a lambda per element."""
    t = load_tables(spark, sf_dir)
    # the dot-product stage is per-row expensive on a byte-small scan:
    # spread it across cores when the parquet arrives as 1-2 splits
    emb = ensure_min_partitions_files(
        t["embeddings"], table_parquet_files(sf_dir, "embeddings")
    ).withColumn(
        "nb", l2_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nb").alias("nq"),
    )
    pairs = emb.join(broadcast(q), F.col("vec_id") != F.col("query_id"))
    pairs = pairs.withColumn(
        "cos_sim",
        F.round(
            dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb")), 4
        ),
    )
    return (
        _partial_topk(pairs, ["query_id"], [F.desc("cos_sim"), F.asc("vec_id")], TOP_K)
        .select("query_id", "rnk", F.col("vec_id").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", "rnk")
    )


_D_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "[CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) FOR i IN range(1, {d})]), "
    "(x, y) -> x + y)"
).format(d=DIM + 1)
_D_NORM_A = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "[CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) FOR i IN range(1, {d})]), "
    "(x, y) -> x + y))"
).format(d=DIM + 1)
_D_NORM_B = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "[CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) FOR i IN range(1, {d})]), "
    "(x, y) -> x + y))"
).format(d=DIM + 1)

KNN_BRUTE_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_D_DOT} / ({_D_NORM_A} * {_D_NORM_B}), 4) AS cos_sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, rnk, neighbor_id, cos_sim
FROM ranked WHERE rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


PAIRWISE_LABEL_CAP = 4096  # per-label cohort bound (see docstring)


def pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most similar vector pairs within each label class.

    Exact all-pairs is inherently O(cohort^2), so this is a bounded
    small-cohort operator: each label's cohort is capped at the first
    PAIRWISE_LABEL_CAP vec_ids (deterministic, mirrored in the oracle),
    bounding the join at labels * CAP^2/2 pairs regardless of table
    size.  For unbounded cohorts use embedding_neardup's banded
    sign-LSH candidates and re-rank.

    Two value-identical forms (equality pinned in
    tests/test_pairblocks.py), dispatched on pool size: the JVM pair
    join below for small pools, pairblocks' blocked numpy pass at
    scale — the kernel only PRE-SELECTS candidate pairs (per-task
    rounded-top-3 coverage with a margin wider than round-4 can move
    a value) and the JVM re-ranks them with the original
    F.round/window expressions, so no ordering or rounding semantics
    leave Spark."""
    t = load_tables(spark, sf_dir)
    if emb_rows(t["embeddings"], sf_dir) >= PAIR_FAST_MIN_ROWS:
        return _pairwise_topk_blocked(t["embeddings"])
    return _pairwise_topk_join(spark, t["embeddings"])


def _pairwise_topk_join(spark: SparkSession, embeddings: DataFrame) -> DataFrame:
    wcap = Window.partitionBy("label").orderBy("vec_id")
    emb = (
        embeddings
        .withColumn("__r", F.row_number().over(wcap))
        .filter(F.col("__r") <= PAIRWISE_LABEL_CAP)
        .drop("__r")
        # each side's norm ONCE per row, not per pair (the cosine()
        # docstring's own hot-loop rule; dot/(na*nb) is the identical
        # double arithmetic, the norms are just not recomputed
        # cohort-size times)
        .withColumn("__n", l2_norm(F.col("embedding")))
    )
    # the cap window hash-partitions by label, and with few labels the
    # pair stage would run on n_labels tasks (AQE coalesces the tiny
    # shuffle further) — spread the capped cohorts round-robin so the
    # per-pair fold work uses the whole cluster.  The capped table is
    # bounded (labels x CAP rows), so this extra exchange is small by
    # construction.
    a = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "label",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("__n").alias("na"),
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("__n").alias("nb"),
    )
    pairs = a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
    pairs = pairs.withColumn(
        "cos_sim",
        F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 4),
    )
    return (
        _partial_topk(
            pairs, ["label"], [F.desc("cos_sim"), F.asc("vec_a"), F.asc("vec_b")], 3
        )
        .select("label", "rnk", "vec_a", "vec_b", "cos_sim")
        .orderBy("label", "rnk")
    )


def _pairwise_topk_blocked(embeddings: DataFrame) -> DataFrame:
    """Blocked numpy pair pass + JVM re-rank.  The kernel's candidate
    set provably contains every pair the rounded-top-3 can select
    (pairblocks docstring), and row_number over a superset assigns the
    same ranks 1..3 to the same rows, so this is value-identical to
    the join form."""
    tasks = block_pair_tasks(packed_blocks(embeddings, cap=PAIRWISE_LABEL_CAP))
    cand = tasks.mapInPandas(pairwise_topk_kernel, PAIRWISE_KERNEL_SCHEMA)
    wfin = Window.partitionBy("label").orderBy(
        F.desc("cos_sim"), F.asc("vec_a"), F.asc("vec_b")
    )
    return (
        cand.withColumn("cos_sim", F.round(F.col("cos_raw"), 4))
        .withColumn("rnk", F.row_number().over(wfin).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("label", "rnk", "vec_a", "vec_b", "cos_sim")
        .orderBy("label", "rnk")
    )


PAIRWISE_TOPK_SQL = f"""
WITH capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS __r
    FROM embeddings
  ) WHERE __r <= {PAIRWISE_LABEL_CAP}
), pairs AS (
  SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_D_DOT} / ({_D_NORM_A} * {_D_NORM_B}), 4) AS cos_sim
  FROM capped a JOIN capped b
    ON a.label = b.label AND a.vec_id < b.vec_id
), ranked AS (
  SELECT label, vec_a, vec_b, cos_sim,
         row_number() OVER (PARTITION BY label
                            ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC) AS rnk
  FROM pairs
)
SELECT label, rnk, vec_a, vec_b, cos_sim
FROM ranked WHERE rnk <= 3
ORDER BY label, rnk
"""


# --- LSH ANN (rows-only) -------------------------------------------------

N_PLANES = 8


def _hyperplanes() -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 bits (no RNG state)."""
    planes = []
    for j in range(N_PLANES):
        bits = []
        for i in range(DIM):
            h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
            bits.append(1.0 if int(h[0], 16) < 8 else -1.0)
        planes.append(bits)
    return planes


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (single
    probe; recall traded for a 2^8 candidate reduction)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    planes = _hyperplanes()

    def bucket(col: Column) -> Column:
        # one packed plane literal + one transform (r14: the unrolled
        # form duplicated the fold lambda and its 64-literal plane
        # array N_PLANES times); per-plane fold unchanged, so the
        # bucket string is bit-identical
        packed = F.array(*[F.array(*[F.lit(x) for x in p]) for p in planes])
        bits = F.transform(
            packed,
            lambda w: F.when(
                F.aggregate(
                    F.zip_with(col, w, lambda e, ww: e.cast("double") * ww),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                "1",
            ).otherwise("0"),
        )
        return F.array_join(bits, "")

    # spread the scan BEFORE the per-row bucket folds (8 planes x dim)
    # and the pair stage: the byte-small parquet arrives as 1-2 splits
    # and a broadcast join keeps the stream side's partitioning, so
    # without this the whole candidate stage ran nearly single-task.
    # Norms are hoisted per row (cosine() hot-loop rule): dot/(nq*nb)
    # is the same double arithmetic as _fold_cosine per pair.
    emb_b = ensure_min_partitions_files(
        emb, table_parquet_files(sf_dir, "embeddings")
    ).withColumn(
        "bucket", bucket(F.col("embedding"))
    ).withColumn("nb", l2_norm(F.col("embedding")))
    q = emb_b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nb").alias("nq"),
        "bucket",
    )
    cands = emb_b.join(broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    cands = cands.withColumn(
        "cos_sim",
        F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb")), 4),
    )
    return (
        _partial_topk(cands, ["query_id"], [F.desc("cos_sim"), F.asc("vec_id")], TOP_K)
        .select("query_id", "rnk", F.col("vec_id").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", "rnk")
    )


def _bucket_sql(prefix: str = "") -> str:
    """DuckDB twin of the Spark ``bucket`` expression: sign bits of
    the in-order fold of embedding·plane for the same md5-derived ±1
    hyperplanes, so both engines compute identical doubles and the
    bucket strings match exactly."""
    parts = []
    for p in _hyperplanes():
        lit = "[" + ",".join("1.0" if x > 0 else "-1.0" for x in p) + "]"
        dot = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"[CAST({prefix}embedding[i] AS DOUBLE) * ({lit})[i] "
            f"FOR i IN range(1, {DIM + 1})]), (x, y) -> x + y)"
        )
        parts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


def _knn_lsh_sql() -> str:
    return f"""
WITH bkt AS (
  SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings
), pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_D_DOT} / ({_D_NORM_A} * {_D_NORM_B}), 4) AS cos_sim
  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, rnk, neighbor_id, cos_sim
FROM ranked WHERE rnk <= {TOP_K}
ORDER BY query_id, rnk
"""


# --- IVF ANN -------------------------------------------------------------

N_CELLS = 16
# Probe half the cells: measured recall@5 at sf0.01 is >= 0.6 for
# every query (min over queries), giving the 0.4 invariant a full
# one-neighbor flip of margin against float-avg assignment jitter.
N_PROBE = 8
N_LLOYD = 2


def _seq_norm(vec: list[float]) -> float:
    """Driver-side twin of l2_norm's strict left fold — same IEEE
    double ops in the same order, so the literal equals what the JVM
    expression would compute for the same centroid array."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _cell_scores(
    col: Column, cents: list[tuple[int, list[float]]], norm: Column | None = None
) -> Column:
    """Cells sorted by descending cosine to ``col`` (literal centroid
    arrays — evaluated JVM-side, no shuffle).

    r14 shape: centroids ride in ONE packed literal array and the
    score is a single generic transform lambda instead of k
    independent fold expressions — same doubles (the per-centroid
    fold is unchanged), but the expression tree no longer grows k
    lambdas (measured 1.9 -> 1.1 s per assignment pass at sf0.1
    before the norm hoists).  Each centroid's own norm is a
    precomputed literal (driver-side strict left fold, bit-identical
    to the JVM fold over the same literals), and callers pass the
    row's norm column so it folds once per ROW instead of once per
    (row, centroid)."""
    packed = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cell"),
                F.array(*[F.lit(x) for x in c]).alias("v"),
                F.lit(_seq_norm(c)).alias("nv"),
            )
            for cid, c in cents
        ]
    )
    norm = l2_norm(col) if norm is None else norm
    scored = F.transform(
        packed,
        lambda e: F.struct(
            F.round(dot(col, e["v"]) / (norm * e["nv"]), 6).alias("cos"),
            e["cell"].alias("cell"),
        ),
    )
    return F.reverse(F.array_sort(scored))


def train_ivf_centroids(
    emb: DataFrame, n_cells: int = N_CELLS, n_iter: int = N_LLOYD
) -> list[tuple[int, list[float]]]:
    """Spherical k-means centroids trained with ``n_iter`` Lloyd
    rounds, all aggregation distributed (posexplode + groupBy mean —
    the label_centroids shape); only the k x dim centroid matrix ever
    reaches the driver.  Seeds are a deterministic md5-spread sample,
    so training is reproducible with no RNG state."""
    seeds = (
        emb.withColumn("__r", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__r", "vec_id")
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    cents = [(i, [float(x) for x in r["embedding"]]) for i, r in enumerate(seeds)]
    embn = emb.withColumn("__nb", l2_norm(F.col("embedding")))
    for _ in range(n_iter):
        assigned = embn.withColumn(
            "cell",
            F.element_at(
                _cell_scores(F.col("embedding"), cents, F.col("__nb")), 1
            )["cell"],
        )
        rows = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .collect()
        )
        means = {int(r["cell"]): [float(p["m"]) for p in r["ms"]] for r in rows}
        # empty cells keep their previous centroid
        cents = [(cid, means.get(cid, c)) for cid, c in cents]
    return cents


IVF_RECALL_TAU = 0.4  # recall@k floor the IVF index must clear


def knn_ivf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN neighbor rows: assign vectors to the nearest of N_CELLS
    k-means centroids (trained with distributed Lloyd iterations),
    probe the query's N_PROBE closest cells only."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cents = train_ivf_centroids(emb)

    def cell_scores(col: Column, norm: Column) -> Column:
        return _cell_scores(col, cents, norm)

    # spread the scan before the per-row cell-assignment folds and the
    # broadcast-joined candidate stage (same parallelism-collapse fix
    # as knn_lsh), and hoist each side's norm out of the per-pair
    # cosine (identical doubles: dot/(nq*nb))
    emb_s = ensure_min_partitions_files(
        emb, table_parquet_files(sf_dir, "embeddings")
    ).withColumn("nb", l2_norm(F.col("embedding")))
    emb_c = emb_s.withColumn(
        "cell",
        F.element_at(cell_scores(F.col("embedding"), F.col("nb")), 1)["cell"],
    )
    q = (
        emb_s.filter(F.col("vec_id") < N_QUERIES)
        .withColumn(
            "probes",
            F.slice(cell_scores(F.col("embedding"), F.col("nb")), 1, N_PROBE),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nb").alias("nq"),
            F.explode(F.transform("probes", lambda s: s["cell"])).alias("cell"),
        )
    )
    cands = emb_c.join(broadcast(q), "cell").filter(F.col("vec_id") != F.col("query_id"))
    cands = cands.withColumn(
        "cos_sim",
        F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb")), 4),
    )
    return (
        _partial_topk(cands, ["query_id"], [F.desc("cos_sim"), F.asc("vec_id")], TOP_K)
        .select("query_id", "rnk", F.col("vec_id").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", "rnk")
    )


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a hard correctness contract: the trained-index
    top-k is joined against the exact brute-force top-k on the same
    queries and each query's recall@k must clear IVF_RECALL_TAU.
    Centroid values are Lloyd-iteration artifacts no other engine
    reproduces bit-for-bit, so (as with kmeans_clusters) the
    oracle-checked invariant IS the contract; the raw neighbor rows
    remain available via knn_ivf_neighbors."""
    ivf = knn_ivf_neighbors(spark, sf_dir)
    exact = knn_brute_force(spark, sf_dir).select("query_id", "neighbor_id")
    hits = ivf.join(exact, ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        ivf.select("query_id")
        .distinct()
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.lit(TOP_K).alias("k"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(TOP_K) >= IVF_RECALL_TAU
            ).alias("recall_ok"),
        )
    )
    return per_q.orderBy("query_id")


KNN_IVF_SQL = f"""
SELECT vec_id AS query_id, {TOP_K} AS k, TRUE AS recall_ok
FROM embeddings WHERE vec_id < {N_QUERIES}
ORDER BY query_id
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, emitted as (label, pos, avg) rows: one
    posexplode + one groupBy — the building block of k-means/IVF
    training.  Emitting positions flat (instead of re-assembling
    arrays) keeps the result hash-comparable and the shuffle narrow."""
    t = load_tables(spark, sf_dir)
    return (
        t["embeddings"]
        .select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(money_avg("x", 5).alias("centroid_val"))
        .orderBy("label", "pos")
    )


LABEL_CENTROIDS_SQL = """
SELECT label, CAST(pos - 1 AS INT) AS pos,
       round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(*), 5) AS centroid_val
FROM (SELECT label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
GROUP BY label, pos
ORDER BY label, pos
"""


def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm distribution per label — JVM-side fold, no Python."""
    t = load_tables(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return (
        t["embeddings"]
        .withColumn("norm", norm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            money_avg("norm", 4).alias("avg_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


VECTOR_NORM_STATS_SQL = """
SELECT label, count(*) AS n_vectors,
       round(min(norm), 4) AS min_norm,
       round(CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
       round(max(norm), 4) AS max_norm
FROM (SELECT label,
             sqrt(list_sum(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings)
GROUP BY label
ORDER BY label
"""


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means as a first-class query: train centroids with
    distributed Lloyd iterations (train_ivf_centroids), assign every
    vector, and emit one summary row with an oracle-checkable
    invariant — clustering must beat the single-centroid baseline on
    cosine inertia (sum of 1 - cos(v, centroid)).  The assignment/
    centroid values themselves are iteration-order artifacts no other
    engine reproduces, so the invariant IS the contract."""
    from icechunk_spark.engine import local_df

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    cents = train_ivf_centroids(emb)
    embn = emb.withColumn("__nb", l2_norm(F.col("embedding")))
    assigned = embn.withColumn(
        "best",
        F.element_at(_cell_scores(F.col("embedding"), cents, F.col("__nb")), 1),
    )
    inertia = assigned.agg(
        F.sum(F.lit(1.0) - F.col("best.cos")).alias("inertia"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("best.cell").alias("used"),
    ).collect()[0]
    # baseline: every vector in one cluster at the global mean centroid
    mean_rows = (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .orderBy("pos")
        .collect()
    )
    mean_c = [(0, [float(r["m"]) for r in mean_rows])]
    base = embn.agg(
        F.sum(
            F.lit(1.0)
            - F.element_at(
                _cell_scores(F.col("embedding"), mean_c, F.col("__nb")), 1
            )["cos"]
        ).alias("inertia")
    ).collect()[0]
    return local_df(
        spark,
        [
            {
                "n_vectors": int(inertia["n"]),
                "n_clusters": N_CELLS,
                "clusters_used_at_least_half": int(inertia["used"]) >= N_CELLS // 2,
                "beats_single_centroid": float(inertia["inertia"]) < float(base["inertia"]),
            }
        ],
        "n_vectors bigint, n_clusters int, "
        "clusters_used_at_least_half boolean, beats_single_centroid boolean",
    )


KMEANS_CLUSTERS_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       {N_CELLS} AS n_clusters,
       TRUE AS clusters_used_at_least_half,
       TRUE AS beats_single_centroid
FROM embeddings
"""


QUERIES = {
    "knn_brute_force": knn_brute_force,
    "pairwise_topk": pairwise_topk,
    "knn_lsh": knn_lsh,
    "knn_ivf": knn_ivf,
    "label_centroids": label_centroids,
    "vector_norm_stats": vector_norm_stats,
    "kmeans_clusters": kmeans_clusters,
}

ORACLES = {
    "kmeans_clusters": KMEANS_CLUSTERS_SQL,
    "knn_brute_force": KNN_BRUTE_SQL,
    "knn_lsh": _knn_lsh_sql(),
    "knn_ivf": KNN_IVF_SQL,
    "pairwise_topk": PAIRWISE_TOPK_SQL,
    "label_centroids": LABEL_CENTROIDS_SQL,
    "vector_norm_stats": VECTOR_NORM_STATS_SQL,
}
