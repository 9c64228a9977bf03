"""Product quantization for embedding columns (SURVEY.md §2d
extension): the memory-side half of a 100 TB ANN system (IVF gives
the scan-pruning half; PQ gives the in-RAM compression that lets a
billion vectors fit an executor fleet — Jegou et al. 2011, "Product
Quantization for Nearest Neighbor Search").

d=64 vectors split into M=16 subspaces of 4 dims; each subspace gets
its own K=16-code codebook (64 bits per vector = 8 bytes vs 256 raw,
32x).  Training runs ALL subspaces jointly — one exploded
(vec_id, m, sub) frame, one assignment job + one mean-update job per
Lloyd round regardless of M (a per-subspace loop would be 2·M·rounds
scheduler-floor jobs).  Only the M x K x 4 codebook floats reach the
driver.  Queries never decode: ADC (asymmetric distance) scores a
query against the CODES via literal lookup-table element_at, then the
standard rerank: the ADC shortlist (top max(4k, n/100) — the "rerank
1%" heuristic, which is what keeps recall flat as n grows) is
re-scored exactly.

Codebook/assignment values are Lloyd-iteration artifacts no other
engine reproduces bit-for-bit, so (kmeans_clusters / knn_ivf
precedent) the oracle-checked INVARIANTS are the contract:
- quantization must beat the single-mean baseline on SSE,
- no subspace codebook collapses (>= K/2 codes in use in every one),
- MEAN rerank recall@k vs the exact L2 top-k clears PQ_RECALL_TAU
  (isotropic random vectors are the adversarial case for PQ — no
  structure to exploit — so the floor is deliberately conservative;
  measured 0.60-0.68 across sf0.001-0.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.engine import local_df
from icechunk_spark.functions import ensure_min_partitions_files
from icechunk_spark.operators.similarity import N_QUERIES, TOP_K, _partial_topk

PQ_M = 16  # subspaces
PQ_SUB = 4  # dims per subspace
PQ_K = 16  # codes per codebook (4 bits)
PQ_LLOYD = 2
#: Lloyd training runs on a deterministic md5-bucketed SAMPLE of at
#: most this many vectors (VERDICT r10 #7): codebook quality needs a
#: statistically representative sample, not the population — K=16
#: centroids per 4-dim subspace saturate long before 64k points —
#: while assignment/encode still covers the FULL set exactly once.
#: Below the cap the sample is the whole input (bit-identical to
#: unsampled training); the sf10 600k-vector set trains ~9x less.
PQ_TRAIN_CAP = 65_536
PQ_RECALL_TAU = 0.45  # MEAN rerank recall@k floor
RERANK_FRAC = 100  # shortlist = max(4k, n // RERANK_FRAC)

RAW_BYTES = 4 * PQ_M * PQ_SUB  # float32 vector
CODE_BYTES = PQ_M * (PQ_K.bit_length() - 1) // 8  # M codes of log2(K) bits
COMPRESSION_X = RAW_BYTES // CODE_BYTES


def _l2sq(col: Column, arr: Column) -> Column:
    """Squared L2 distance between two array expressions —
    sequential left fold, deterministic."""
    return F.aggregate(
        F.zip_with(
            col, arr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _books_lit(books: list[list[tuple[int, list[float]]]]) -> Column:
    """The full codebook set as ONE literal: books[m][code] -> array."""
    return F.array(*[F.array(*[_lit_vec(c) for _, c in codes]) for codes in books])


def _argmin_struct(sub: Column, codes_for_m: Column) -> Column:
    """(d2, code) of the nearest code; ties on the rounded distance
    break to the lower code id (struct ordering).  array_min, not
    array_sort+element_at: a single pass over the K structs.

    r14: ONE transform over the codes array instead of K unrolled
    element_at expressions — the old form re-embedded the codes_for_m
    subtree (itself an element_at of the full M x K x SUB literal) K
    times, a ~16k-literal-node expression per assignment that
    dominated Lloyd-round planning.  The two-argument HOF lambda's
    index IS the code id, and the per-code fold is unchanged, so the
    (d2, code) structs are bit-identical."""
    scored = F.transform(
        codes_for_m,
        lambda c, i: F.struct(
            F.round(_l2sq(sub, c), 6).alias("d2"),
            i.cast("int").alias("code"),
        ),
    )
    return F.array_min(scored)


def _sub_col(m: int) -> Column:
    return F.slice("embedding", m * PQ_SUB + 1, PQ_SUB)


def _seed_pad(books: list[list[tuple[int, list[float]]]]) -> None:
    """Shared seed post-processing (both training paths): sort by
    code id, reject empty input, cycle-pad short codebooks to PQ_K
    (a duplicated centroid has the same d2 but a higher code id, so
    it loses every argmin tie, and Lloyd keeps an empty code's
    previous vector)."""
    for b in books:
        b.sort()
        if not b:
            raise ValueError("pq: empty embeddings input — cannot train codebooks")
        n_seed = len(b)
        while len(b) < PQ_K:
            b.append((len(b), b[len(b) % n_seed][1]))


# The bounded collect either returns the whole training frame or
# proves it exceeds the bound in one job (BPE-trainer pattern).  The
# md5 sample targets PQ_TRAIN_CAP rows in expectation; 2x covers any
# plausible overshoot, and past it the distributed rounds run anyway.
_PQ_DRIVER_BOUND = 2 * PQ_TRAIN_CAP


def _train_driver_fast_path(train: DataFrame):
    """numpy mirror of the distributed seeds+Lloyd when the (already
    definitionally bounded) training frame fits a driver collect:

    - seeds: md5(f"{m}_{vec_id}") hexdigest ranked by (hex, vec_id)
      per m IS the Window orderBy("__r", "vec_id") — hex strings
      compare lexicographically on both sides;
    - assignment: the per-dimension loop accumulates exactly the JVM
      left fold ((0+t1)+t2)+... of (x-c)^2 — d2 is bit-identical
      pre-round; np.round(·,6) + np.argmin (first minimum = lowest
      code id) mirrors F.round + the (d2, code) struct array_min,
      the same precedent test_pq.py pins for _np_encode;
    - means: per-(m, code, pos) float64 mean.  Spark's F.avg is a
      partial-sum whose order depends on partitioning — the
      distributed path is itself only ulp-deterministic, and the
      operator's declared output is invariant booleans with wide
      margins by design, so both paths satisfy the same contract
      (the fast path is additionally run-to-run deterministic).

    Returns None (caller falls through to the distributed rounds)
    when the bound is exceeded or any value is non-finite (JVM NaN
    ordering differs from np.argmin's NaN propagation)."""
    import hashlib

    import numpy as np

    pdf = train.select("vec_id", "embedding").limit(_PQ_DRIVER_BOUND + 1).toPandas()
    if len(pdf) > _PQ_DRIVER_BOUND:
        return None
    if len(pdf) == 0:
        raise ValueError("pq: empty embeddings input — cannot train codebooks")
    e = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    if not np.isfinite(e).all():
        return None
    vid = pdf["vec_id"].to_numpy()

    books: list[list[tuple[int, list[float]]]] = []
    for m in range(PQ_M):
        keys = sorted(
            range(len(vid)),
            key=lambda i: (hashlib.md5(f"{m}_{vid[i]}".encode()).hexdigest(), vid[i]),
        )[:PQ_K]
        books.append(
            [
                (rk, [float(x) for x in e[i, m * PQ_SUB : (m + 1) * PQ_SUB]])
                for rk, i in enumerate(keys)
            ]
        )
    _seed_pad(books)

    for _ in range(PQ_LLOYD):
        for m in range(PQ_M):
            s = e[:, m * PQ_SUB : (m + 1) * PQ_SUB]
            cents = np.array([c for _, c in books[m]])
            acc = np.zeros((len(vid), len(cents)))
            for j in range(PQ_SUB):
                t = s[:, j][:, None] - cents[None, :, j]
                acc += t * t
            code = np.argmin(np.round(acc, 6), axis=1)
            books[m] = [
                (
                    cid,
                    [float(x) for x in s[code == cid].mean(axis=0)]
                    if (code == cid).any()
                    else old,
                )
                for cid, old in books[m]
            ]
    return books


def train_pq_codebooks(emb: DataFrame) -> list[list[tuple[int, list[float]]]]:
    """All M codebooks trained jointly over the exploded
    (vec_id, m, sub) frame: per Lloyd round exactly one assignment +
    one mean-update aggregation, whatever M is.  Deterministic
    md5-spread seeds; empty codes keep their previous vector.

    r14 2nd pass: the training input is bounded BY CONSTRUCTION (the
    md5 sample caps it at ~PQ_TRAIN_CAP vectors), so the whole
    seeds+Lloyd stage runs driver-side in numpy when one bounded
    Arrow collect fits (_train_driver_fast_path, the fps_sample /
    BPE-trainer pattern) — the distributed rounds (a window collect
    plus PQ_LLOYD assignment+mean jobs over the persisted sub frame)
    remain the >bound / non-finite fallback."""
    # deterministic md5-bucketed training sample: keep rows whose
    # 32-bit md5 prefix falls under CAP/n of the hash space — a plain
    # distributed filter that preserves partitioning.  NOT an
    # orderBy().limit(CAP): a limit past topKSortFallbackThreshold
    # (10k) degrades to a single-partition global sort that collapses
    # the parallelism of every Lloyd round downstream (measured 154 s
    # at sf10 before this form).  For n <= CAP no filter is applied
    # and training is bit-identical to the unsampled path.
    # count(*) over an unfiltered parquet scan compiles to a
    # metadata-only row-group-stats job — cheap relative to a Lloyd round
    n_vec = emb.count()
    if n_vec > PQ_TRAIN_CAP:
        cutoff = (1 << 32) * PQ_TRAIN_CAP // n_vec
        train = emb.filter(
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            < F.lit(cutoff)
        )
    else:
        train = emb
    fast = _train_driver_fast_path(train)
    if fast is not None:
        return fast
    sub = train.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("m"), _sub_col(m).alias("sub"))
                    for m in range(PQ_M)
                ]
            )
        ).alias("z"),
    ).select("vec_id", F.col("z.m").alias("m"), F.col("z.sub").alias("sub"))
    sub = sub.persist()
    from pyspark.sql import Window

    w = Window.partitionBy("m").orderBy("__r", "vec_id")
    seeds = (
        sub.withColumn(
            "__r", F.md5(F.concat_ws("_", F.col("m"), F.col("vec_id").cast("string")))
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PQ_K)
        .select("m", "rk", "sub")
        .collect()
    )
    books: list[list[tuple[int, list[float]]]] = [[] for _ in range(PQ_M)]
    for r in seeds:
        books[r["m"]].append((r["rk"] - 1, [float(x) for x in r["sub"]]))
    _seed_pad(books)
    for _ in range(PQ_LLOYD):
        lit = _books_lit(books)
        assigned = sub.withColumn(
            "code", _argmin_struct(F.col("sub"), F.element_at(lit, F.col("m") + 1))["code"]
        )
        rows = (
            assigned.select("m", "code", F.posexplode("sub").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("x").alias("mv"))
            .groupBy("m", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("ms"))
            .collect()
        )
        means = {
            (int(r["m"]), int(r["code"])): [float(p["mv"]) for p in r["ms"]]
            for r in rows
        }
        books = [
            [(cid, means.get((m, cid), c)) for cid, c in books[m]]
            for m in range(PQ_M)
        ]
    sub.unpersist()
    return books


def _np_encode(e, book_mat):
    """Vectorized PQ encode: codes (b x M, int64) + per-row
    reconstruction SSE, matching the JVM _argmin_struct semantics —
    d2 rounded to 6dp, ties to the lower code id (np.argmin takes the
    first minimum).  Parity with the JVM expression is pinned in
    tests/test_pq.py."""
    import numpy as np

    codes = np.empty((len(e), PQ_M), dtype=np.int64)
    recon = np.zeros(len(e))
    for m in range(PQ_M):
        s = e[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        c = book_mat[m]
        d = (s * s).sum(axis=1)[:, None] + (c * c).sum(axis=1)[None, :] - 2.0 * (s @ c.T)
        np.maximum(d, 0.0, out=d)
        d = np.round(d, 6)
        codes[:, m] = d.argmin(axis=1)
        recon += d[np.arange(len(e)), codes[:, m]]
    return codes, recon


def pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant row for the full PQ pipeline.  After Lloyd training
    (sampled, distributed — train_pq_codebooks) every per-vector stage
    runs as Arrow-batched numpy inside mapInPandas: the 16-way
    per-subspace argmin encode is a (b x K) GEMM per subspace and the
    query audit is one (b x N_Q) GEMM per batch.  The JVM
    higher-order-function form of the same math was measured at
    34.9 s for the encode alone at sf10 (interpreted per-element
    lambdas; the unrolled-expression alternative is a recorded
    negative result — it falls out of codegen), and distances stay
    INTERNAL to the operator (the oracle checks invariant booleans),
    so nothing here touches the cross-engine value contract.  Two
    passes over embeddings total: stats partials + the pair audit;
    only codebooks, query rows and the 7-field invariant row reach
    the driver."""
    import numpy as np
    import pandas as pd

    emb = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["embeddings"],
        table_parquet_files(sf_dir, "embeddings"),
    )
    books = train_pq_codebooks(emb)
    book_mat = np.array(
        [[c for _, c in books[m]] for m in range(PQ_M)], dtype=np.float64
    )  # M x K x PQ_SUB

    mean_rows = (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mv"))
        .orderBy("pos")
        .collect()
    )
    mean_arr = np.array([float(r["mv"]) for r in mean_rows])

    # pass 1 — stats PARTIALS: one bounded row per Arrow batch
    # (count, SSE sums, per-subspace used-code BITMASK), final
    # reduction in Spark via sum/bit_or
    stat_schema = "n long, recon double, base double, " + ", ".join(
        f"mask_{m} long" for m in range(PQ_M)
    )

    def _stat_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes, recon = _np_encode(e, book_mat)
            diff = e - mean_arr[None, :]
            row = {
                "n": [len(e)],
                "recon": [float(recon.sum())],
                "base": [float((diff * diff).sum())],
            }
            for m in range(PQ_M):
                row[f"mask_{m}"] = [int(np.bitwise_or.reduce(1 << codes[:, m]))]
            yield pd.DataFrame(row)

    stats = (
        emb.select("embedding")
        .mapInPandas(_stat_batches, stat_schema)
        .agg(
            F.sum("n").alias("n"),
            F.sum("recon").alias("pq_sse"),
            F.sum("base").alias("base_sse"),
            *[F.bit_or(f"mask_{m}").alias(f"mask_{m}") for m in range(PQ_M)],
        )
        .collect()[0]
    )
    n_vec = int(stats["n"])
    used = [bin(int(stats[f"mask_{m}"])).count("1") for m in range(PQ_M)]
    shortlist = max(4 * TOP_K, n_vec // RERANK_FRAC)

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # THE ADC trick (Jegou §IV): per-(query, subspace) distance
    # TABLES, computed once driver-side from the N_QUERIES bounded
    # query rows (N_Q x M x K floats), so the scan side does pure
    # table lookups — no per-pair subvector math beyond one GEMM.
    qrows = {int(r["query_id"]): list(r["qe"]) for r in q.collect()}
    qids = sorted(qrows)
    if qids != list(range(len(qids))):  # explicit: asserts vanish under -O
        raise ValueError(f"pq: query ids must be contiguous 0..N-1, got {qids[:5]}...")
    q_mat = np.array([qrows[i] for i in qids], dtype=np.float64)
    adc_tab = np.empty((len(qids), PQ_M, PQ_K))
    for m in range(PQ_M):
        sq = q_mat[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        c = book_mat[m]
        adc_tab[:, m, :] = (
            (sq * sq).sum(axis=1)[:, None]
            + (c * c).sum(axis=1)[None, :]
            - 2.0 * (sq @ c.T)
        )
    n_q = len(qids)
    pair_schema = "query_id long, vec_id long, adc_d double, true_d double"

    # pass 2 — the pair audit: encode is FUSED into the batch (numpy
    # re-encode is cheaper than shipping 16 code columns through a
    # persisted frame), one GEMM scores every query at once
    def _pair_batches(batches):
        q_sq = (q_mat * q_mat).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes, _ = _np_encode(e, book_mat)
            vid = pdf["vec_id"].to_numpy()
            b = len(pdf)
            # ||e - q||^2, clamped: float cancellation can dip
            # epsilon-negative for near-equal rows
            d = (e * e).sum(axis=1)[:, None] + q_sq[None, :] - 2.0 * (e @ q_mat.T)
            np.maximum(d, 0.0, out=d)
            adc = np.zeros((b, n_q))
            for m in range(PQ_M):
                adc += adc_tab[:, m, :][:, codes[:, m]].T
            out = pd.DataFrame(
                {
                    "query_id": np.tile(np.arange(n_q, dtype=np.int64), b),
                    "vec_id": np.repeat(vid, n_q),
                    "adc_d": np.round(adc.ravel(), 6),
                    "true_d": np.round(d.ravel(), 6),
                }
            )
            yield out[out["query_id"] != out["vec_id"]]

    pairs = (
        emb.select("vec_id", "embedding")
        .mapInPandas(_pair_batches, pair_schema)
        .persist()
    )
    # ADC shortlist -> exact rerank (the production read path); the
    # exact top-k over ALL pairs is the truth it must recover
    sl = _partial_topk(
        pairs, ["query_id"], [F.asc("adc_d"), F.asc("vec_id")], shortlist
    ).select("query_id", "vec_id", "true_d")
    rerank = _partial_topk(
        sl, ["query_id"], [F.asc("true_d"), F.asc("vec_id")], TOP_K
    ).select("query_id", "vec_id")
    exact = _partial_topk(
        pairs, ["query_id"], [F.asc("true_d"), F.asc("vec_id")], TOP_K
    ).select("query_id", "vec_id")
    hits = exact.join(rerank, ["query_id", "vec_id"], "left_semi")
    mean_recall = (
        q.select("query_id")
        .join(hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("h")), "query_id", "left")
        .agg(F.avg(F.coalesce(F.col("h"), F.lit(0)) / TOP_K).alias("r"))
        .collect()[0]["r"]
    )

    pairs.unpersist()

    return local_df(
        spark,
        [
            {
                "n_vectors": n_vec,
                "m_subspaces": PQ_M,
                "k_codes": PQ_K,
                "compression_x": COMPRESSION_X,
                "codebooks_half_used": all(u >= PQ_K // 2 for u in used),
                "beats_mean_baseline": float(stats["pq_sse"]) < float(stats["base_sse"]),
                "rerank_recall_ok": float(mean_recall) >= PQ_RECALL_TAU,
            }
        ],
        "n_vectors bigint, m_subspaces int, k_codes int, compression_x int, "
        "codebooks_half_used boolean, beats_mean_baseline boolean, rerank_recall_ok boolean",
    )


PQ_QUANTIZE_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       {PQ_M} AS m_subspaces,
       {PQ_K} AS k_codes,
       {COMPRESSION_X} AS compression_x,
       TRUE AS codebooks_half_used,
       TRUE AS beats_mean_baseline,
       TRUE AS rerank_recall_ok
FROM embeddings
"""


QUERIES = {
    "pq_quantize": pq_quantize,
}

ORACLES = {
    "pq_quantize": PQ_QUANTIZE_SQL,
}
