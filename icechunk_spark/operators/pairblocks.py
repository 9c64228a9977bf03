"""Blocked all-pairs cosine kernels for the bounded pair-stage
operators (guide §4.2: let Spark do distribution, hand whole batches
to vectorized numpy instead of evaluating ~10^9 interpreted
expression folds).

The JVM pair join (broadcast + per-pair unrolled fold) is the right
shape for SMALL cohorts, but its per-pair cost is dominated by row
machinery: every surviving pair copies two 64-float arrays into the
joined row before the fold runs (~µs/pair).  At sf10 the label cells
hold ~20k vectors, the pair count is O(cell²) ≈ 2×10⁹, and the join
form exceeds a 10-minute cutoff.  This module replaces only the PAIR
ENUMERATION + DOT stage with a blocked numpy pass and keeps every
decision that affects output values in the JVM:

- Vectors are packed into per-(label, block) rows (block = row_number
  over vec_id, so block k's ids all precede block k+1's), and each
  (block_i, block_j) pair with i <= j becomes ONE task row — the
  candidate join is labels × nblk² tiny packed rows, never a row per
  pair.
- Inside a task, dots are computed tile-by-tile with a rank-1-update
  loop over dimensions: ``acc += X[:,d,None] * Y[None,:,d]``.  Per
  element that is exactly the strict left fold
  ``((0 + p_1) + p_2) + …`` the JVM ``F.aggregate(zip_with(…))``
  computes, so every emitted double is bit-identical to the join
  path's (pinned in tests/test_pairblocks.py).  Norms use the same
  fold; ``dots / outer(na, nb)`` is the identical ``dot/(na*nb)``
  arithmetic.  Tiles are ≤ _TILE² so acc/tmp stay cache-resident.
- NO rounding happens in Python.  pairwise_topk's kernel only
  *pre-selects* candidate pairs (per-tile/per-task top-3 by
  NaN-as-greatest value, plus a margin strictly wider than the
  maximum distance F.round(·, 4) can move a value), then the JVM
  re-ranks the tiny candidate set with the original
  ``F.round``/window expressions.  semdedup's kernel emits each
  larger-id's MAX pair value (NaN mapped to +inf, matching Spark's
  NaN-greatest ordering) and the JVM applies the original
  ``F.round(·,4) >= threshold`` filter — rounding is monotone, so
  round(max) ≥ t  ⟺  any round(pair) ≥ t.

Scale: tasks are bounded by PAIR_BLOCK² pairs each regardless of
cohort size, parallelism is labels × nblk(nblk+1)/2, and only packed
block payloads (cohort bytes × nblk) ever cross the Arrow boundary —
no per-pair row exists anywhere outside numpy registers/cache.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAIR_BLOCK = 4096  # rows per packed block: one task is <= PAIR_BLOCK² pairs
PAIR_FAST_MIN_ROWS = 1024  # below this the plain JVM pair join wins (measured)
_TILE = 512  # numpy tile edge: acc/tmp (_TILE² doubles = 2 MB) stay cache-hot

# Candidate margin for top-k preselection: F.round(x, 4) moves a
# finite double by at most 5e-5 plus representation slack; 1.01e-4
# (+ relative guard for |x| far outside the cosine range) strictly
# covers the gap between two values whose rounded order could differ.
_ROUND4_MARGIN = 1.01e-4

_EPS = 2.220446049250313e-16  # double unit roundoff * 2


def _fp_cos_slack(d: int) -> float:
    """Rigorous bound on |gemm_cos − fold_cos| for FINITE inputs: both
    the strict left fold and any reordered/blocked (BLAS) summation of
    the same d products lie within γ_d·Σ|a_k·b_k| of the true sum
    (standard fp-summation bound, γ_d = d·u/(1−d·u)), and Cauchy–
    Schwarz gives Σ|a_k·b_k| ≤ ‖a‖·‖b‖, so over the SHARED computed
    denominator na·nb (the same fold norms feed both paths) the two
    cosines differ by < ~2·γ_d/(1−δ).  4·d·u + 1e-13 over-covers it
    by >2x at any d below 10^12.  Non-finite cases never rely on this
    bound — NaN/±inf screening values are kept as candidates."""
    return 4.0 * d * _EPS + 1e-13


def emb_rows(emb: DataFrame, sf_dir: str) -> int:
    """Embedding-table row count for the path dispatch: free parquet
    footer read; zero (nested/partitioned layout) is treated as
    unknown → one Spark count, so the dispatch never misreads a big
    table as small (the negatives_ann ADVICE-r12 discipline — here a
    misread only costs speed, not memory, but the same rule holds)."""
    import pyarrow.parquet as pq

    from icechunk_spark.catalog import table_parquet_files

    try:
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in table_parquet_files(sf_dir, "embeddings")
        )
    except Exception:
        n = 0
    return n if n > 0 else emb.count()


def packed_blocks(emb: DataFrame, cap: int | None = None) -> DataFrame:
    """(label, blk, ids, flat) packed rows: blk assigned by row_number
    over vec_id per label (so ids never decrease across blocks), the
    embeddings flattened into one array<float> per block.  NULL labels
    are excluded — the join path's ``a.label == b.label`` can never
    pair them (NULL-safe-equality is NOT used there), so they produce
    no pairs in either form."""
    w = Window.partitionBy("label").orderBy("vec_id")
    df = emb.filter(F.col("label").isNotNull()).withColumn(
        "__r", F.row_number().over(w)
    )
    if cap is not None:
        df = df.filter(F.col("__r") <= cap)
    rows = F.collect_list(F.struct(F.col("vec_id"), F.col("embedding")))
    return (
        df.withColumn("blk", ((F.col("__r") - 1) / F.lit(PAIR_BLOCK)).cast("int"))
        .groupBy("label", "blk")
        .agg(rows.alias("rows"))
        .select(
            "label",
            "blk",
            F.transform("rows", lambda r: r["vec_id"]).alias("ids"),
            F.flatten(F.transform("rows", lambda r: r["embedding"])).alias("flat"),
        )
    )


def block_pair_tasks(blocks: DataFrame) -> DataFrame:
    """One row per (label, blk_a <= blk_b) block pair, payloads
    attached, spread round-robin so the numpy tasks use every core
    (the packed frame is labels × nblk rows — byte-small by the
    operators' bounded-cohort contract)."""
    a = blocks.select(
        "label",
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("flat").alias("flat_a"),
    )
    b = blocks.select(
        F.col("label").alias("label_b"),
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("flat").alias("flat_b"),
    )
    sc = blocks.sparkSession.sparkContext
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("blk_a") <= F.col("blk_b")))
        .drop("label_b")
        .repartition(sc.defaultParallelism)
    )


def _task_mats(row):
    """Decode one task row into sorted (ids, float64 matrix) pairs +
    fold norms.  float32 → float64 is exact, so the products/folds
    below are bit-identical to the JVM's cast-then-multiply chain."""
    import numpy as np

    def side(ids_cell, flat_cell):
        ids = np.asarray(ids_cell, dtype=np.int64)
        mat = np.asarray(flat_cell, dtype=np.float32).astype(np.float64)
        mat = mat.reshape(len(ids), -1) if len(ids) else mat.reshape(0, 0)
        order = np.argsort(ids, kind="stable")
        return ids[order], mat[order]

    ids_a, A = side(row["ids_a"], row["flat_a"])
    if row["blk_a"] == row["blk_b"]:
        ids_b, B = ids_a, A
    else:
        ids_b, B = side(row["ids_b"], row["flat_b"])
    return ids_a, A, ids_b, B


def _fold_norms(A):
    """sqrt of the strict left fold of squares — elementwise identical
    to functions.l2_norm."""
    import numpy as np

    acc = np.zeros(A.shape[0])
    for d in range(A.shape[1]):
        acc += A[:, d] * A[:, d]
    return np.sqrt(acc)


def _fold_dots_tile(A, B, tmp, acc):
    """acc[:m,:n] = strict-left-fold dot of every (row of A, row of B)
    pair via rank-1 updates; per element this is exactly
    ((0 + p_1) + p_2) + … — the JVM aggregate's order."""
    import numpy as np

    m, n = A.shape[0], B.shape[0]
    a, t = acc[:m, :n], tmp[:m, :n]
    a.fill(0.0)
    for d in range(A.shape[1]):
        np.multiply(A[:, d, None], B[None, :, d], out=t)
        a += t
    return a


def _iter_cos_tiles(ids_a, A, ids_b, B, diagonal):
    """Yield (i0, j0, cos_tile, valid_mask) over the task's pair
    space.  cos = dots / (na*nb) with the identical arithmetic order;
    valid excludes the lower triangle + diagonal when both blocks are
    the same (ids are sorted, so position order == id order)."""
    import numpy as np

    na, nb = _fold_norms(A), (None if diagonal else _fold_norms(B))
    if diagonal:
        nb = na
    tmp = np.empty((_TILE, _TILE))
    acc = np.empty((_TILE, _TILE))
    m, n = A.shape[0], B.shape[0]
    for i0 in range(0, m, _TILE):
        i1 = min(i0 + _TILE, m)
        for j0 in range(0, n, _TILE):
            j1 = min(j0 + _TILE, n)
            if diagonal and j1 <= i0:
                continue  # tile entirely below the diagonal
            dots = _fold_dots_tile(A[i0:i1], B[j0:j1], tmp, acc)
            denom = np.multiply.outer(na[i0:i1], nb[j0:j1])
            zero = denom == 0.0
            if zero.any():
                # ANSI parity: the JVM pair join throws DIVIDE_BY_ZERO
                # when any surviving pair's norm product is zero (a
                # zero vector); only cells the join would actually
                # divide count (upper triangle on diagonal blocks)
                ii = np.arange(i0, i0 + zero.shape[0])[:, None]
                jj = np.arange(j0, j0 + zero.shape[1])[None, :]
                if (zero & (ii < jj)).any() if diagonal else zero.any():
                    raise ArithmeticError(
                        "[DIVIDE_BY_ZERO] zero norm product in pair stage "
                        "(parity with spark.sql.ansi.enabled=true: the JVM "
                        "pair join raises here too)"
                    )
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / denom
            if diagonal:
                ii = np.arange(i0, i1)[:, None]
                jj = np.arange(j0, j1)[None, :]
                valid = ii < jj
            else:
                valid = None
            yield i0, j0, cos, valid


def _exact_fold_pairs(A, B, gi, gj, chunk: int = 65536):
    """Strict-left-fold dots for an arbitrary list of (row-of-A,
    row-of-B) pairs: per pair this is exactly ((0+p_1)+p_2)+… — the
    same order as _fold_dots_tile / the JVM aggregate — computed only
    for the gathered pairs.  Chunked so a dense candidate set never
    materializes a len(gi)×d gather larger than chunk rows."""
    import numpy as np

    out = np.empty(len(gi))
    for s in range(0, len(gi), chunk):
        ai = A[gi[s : s + chunk]]
        bj = B[gj[s : s + chunk]]
        acc = np.zeros(ai.shape[0])
        for d in range(A.shape[1]):
            acc += ai[:, d] * bj[:, d]
        out[s : s + chunk] = acc
    return out


def _iter_screened_cos(ids_a, A, ids_b, B, diagonal, select):
    """Screened twin of _iter_cos_tiles (guide §4.2): per tile, ONE
    BLAS gemm produces screening cosines (reordered summation — never
    emitted), ``select`` picks the candidate cells from the flattened
    NaN→+inf / invalid→−inf screening tile, and only those cells get
    the strict-left-fold EXACT dot (bit-identical to the JVM path).
    Callers' select margins must include 2·_fp_cos_slack(d) on top of
    whatever exact-value margin they need — see _fp_cos_slack.  The
    ANSI zero-norm check and the diagonal masking are identical to
    _iter_cos_tiles.  Yields (gi, gj, cos_exact) index/value arrays
    (gi/gj are task-local row positions)."""
    import numpy as np

    na, nb = _fold_norms(A), (None if diagonal else _fold_norms(B))
    if diagonal:
        nb = na
    m, n = A.shape[0], B.shape[0]
    for i0 in range(0, m, _TILE):
        i1 = min(i0 + _TILE, m)
        for j0 in range(0, n, _TILE):
            j1 = min(j0 + _TILE, n)
            if diagonal and j1 <= i0:
                continue  # tile entirely below the diagonal
            denom = np.multiply.outer(na[i0:i1], nb[j0:j1])
            zero = denom == 0.0
            if zero.any():
                # ANSI parity — identical condition to _iter_cos_tiles
                ii = np.arange(i0, i0 + zero.shape[0])[:, None]
                jj = np.arange(j0, j0 + zero.shape[1])[None, :]
                if (zero & (ii < jj)).any() if diagonal else zero.any():
                    raise ArithmeticError(
                        "[DIVIDE_BY_ZERO] zero norm product in pair stage "
                        "(parity with spark.sql.ansi.enabled=true: the JVM "
                        "pair join raises here too)"
                    )
            approx = A[i0:i1] @ B[j0:j1].T
            with np.errstate(divide="ignore", invalid="ignore"):
                approx = approx / denom
            cp = np.where(np.isnan(approx), np.inf, approx)
            if diagonal:
                ii = np.arange(i0, i1)[:, None]
                jj = np.arange(j0, j1)[None, :]
                valid = ii < jj
                cp = np.where(valid, cp, -np.inf)
            else:
                valid = None
            keep = select(cp.ravel())
            if valid is not None and len(keep):
                # drop masked cells, NOT valid pairs that happen to
                # sit at −inf (those must survive to the caller)
                keep = keep[valid.ravel()[keep]]
            if len(keep) == 0:
                continue
            ti, tj = np.unravel_index(keep, cp.shape)
            gi, gj = ti + i0, tj + j0
            dots = _exact_fold_pairs(A, B, gi, gj)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (na[gi] * nb[gj])
            yield gi, gj, cos


def semdedup_kernel(threshold: float):
    """Kernel factory.  Per task: for every larger-id (j-side) vector,
    the MAX pair value over its CANDIDATE partners in the task, NaN
    mapped to +inf (Spark's NaN-greatest ordering; the JVM filter
    round(max) >= t then equals 'any pair passes' because rounding is
    monotone and NaN/+inf both pass).

    Candidates are BLAS-screened at cutoff = threshold −
    (_ROUND4_MARGIN + |t|·1e-9 + 2·fp slack): any pair whose EXACT
    value could round to ≥ threshold has screening value ≥ cutoff, so
    dropping the rest never changes which per-id maxima pass the JVM
    filter — a sub-cutoff pair can lower an emitted max only when that
    max was going to be filtered out anyway (r15; the emitted values
    themselves stay exact strict-fold doubles)."""

    def kernel(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out_label, out_id, out_max = [], [], []
            for _, row in pdf.iterrows():
                ids_a, A, ids_b, B = _task_mats(row)
                if A.shape[0] == 0 or B.shape[0] == 0:
                    continue
                diagonal = row["blk_a"] == row["blk_b"]
                cutoff = threshold - (
                    _ROUND4_MARGIN
                    + abs(threshold) * 1e-9
                    + 2.0 * _fp_cos_slack(A.shape[1])
                )

                def select(cp_flat, _c=cutoff):
                    # ~(x < c) keeps NaN and +inf screening values
                    return np.flatnonzero(~(cp_flat < _c))

                best = np.full(B.shape[0], -np.inf)
                seen = np.zeros(B.shape[0], dtype=bool)
                for gi, gj, cos in _iter_screened_cos(
                    ids_a, A, ids_b, B, diagonal, select
                ):
                    vals = np.where(np.isnan(cos), np.inf, cos)
                    np.maximum.at(best, gj, vals)
                    seen[gj] = True
                if seen.any():
                    out_label.extend([row["label"]] * int(seen.sum()))
                    out_id.extend(ids_b[seen].tolist())
                    out_max.extend(best[seen].tolist())
            yield pd.DataFrame(
                {"label": pd.Series(out_label, dtype="int32"),
                 "dup_id": pd.Series(out_id, dtype="int64"),
                 "vmax": pd.Series(out_max, dtype="float64")}
            )

    return kernel


def _topk_margin(t3: float) -> float:
    return _ROUND4_MARGIN + abs(t3) * 1e-9


def _candidate_cut(vals, k=3, extra=0.0):
    """Indices of entries that could reach rounded-top-k: everything
    within the round-4 margin (+``extra`` — the fp-screening slack
    when ``vals`` are gemm approximations rather than exact folds) of
    the k-th largest NaN-as-inf value.  With fewer than k entries (or
    an infinite k-th), keep all / everything tied at +inf and above."""
    import numpy as np

    if len(vals) <= k:
        return np.arange(len(vals))
    t3 = np.partition(vals, -k)[-k]
    if not np.isfinite(t3):
        if t3 == -np.inf:
            return np.arange(len(vals))
        return np.flatnonzero(vals >= t3)  # t3 = +inf: all inf entries
    return np.flatnonzero(vals >= t3 - _topk_margin(t3) - extra)


def pairwise_topk_kernel(it: Iterator) -> Iterator:
    """Per task: candidate pairs that could reach the per-label
    rounded-top-3 (tile-level cut, then task-level cut), RAW cosine
    emitted — the JVM re-ranks with the original F.round/window, so
    ordering/rounding semantics (including NaN-greatest) never leave
    Spark."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        out = {"label": [], "vec_a": [], "vec_b": [], "cos_raw": []}
        for _, row in pdf.iterrows():
            ids_a, A, ids_b, B = _task_mats(row)
            if A.shape[0] == 0 or B.shape[0] == 0:
                continue
            diagonal = row["blk_a"] == row["blk_b"]
            ci, cj, craw, cp_all = [], [], [], []
            for i0, j0, cos, valid in _iter_cos_tiles(ids_a, A, ids_b, B, diagonal):
                cp = np.where(np.isnan(cos), np.inf, cos)
                if valid is not None:
                    cp = np.where(valid, cp, -np.inf)
                flat = cp.ravel()
                keep = _candidate_cut(flat)
                if valid is not None:
                    # drop masked cells, NOT valid pairs that happen to
                    # sit at -inf (those must survive to the JVM rank)
                    keep = keep[valid.ravel()[keep]]
                if len(keep) == 0:
                    continue
                ti, tj = np.unravel_index(keep, cp.shape)
                ci.append(ti + i0)
                cj.append(tj + j0)
                craw.append(cos.ravel()[keep])
                cp_all.append(flat[keep])
            if not ci:
                continue
            ci = np.concatenate(ci)
            cj = np.concatenate(cj)
            craw = np.concatenate(craw)
            cp_all = np.concatenate(cp_all)
            keep = _candidate_cut(cp_all)
            out["label"].extend([row["label"]] * len(keep))
            out["vec_a"].extend(ids_a[ci[keep]].tolist())
            out["vec_b"].extend(ids_b[cj[keep]].tolist())
            out["cos_raw"].extend(craw[keep].tolist())
        yield pd.DataFrame(
            {"label": pd.Series(out["label"], dtype="int32"),
             "vec_a": pd.Series(out["vec_a"], dtype="int64"),
             "vec_b": pd.Series(out["vec_b"], dtype="int64"),
             "cos_raw": pd.Series(out["cos_raw"], dtype="float64")}
        )


SEMDEDUP_KERNEL_SCHEMA = "label int, dup_id bigint, vmax double"
PAIRWISE_KERNEL_SCHEMA = "label int, vec_a bigint, vec_b bigint, cos_raw double"
