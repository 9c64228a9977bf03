"""Signed random projection (Johnson-Lindenstrauss) for embedding
columns (SURVEY.md §2d extension): the dimensionality-reduction step a
100 TB ANN pipeline runs before indexing — project d=64 vectors onto
k=16 axes whose entries are deterministic ±1 signs (Achlioptas 2001:
database-friendly random projections; the same hash-derived-sign trick
sign-LSH already uses in dedup.embedding_neardup), then AUDIT the
distortion: per label, how far neighbor-pair cosines moved.

The sign matrix is md5(i || '_' || j) parity — standard MD5, so
Python's hashlib (which builds the Spark literals) and DuckDB's md5()
(which the oracle derives the matrix from) agree bit-for-bit.

Plan shape (evolved twice at sf10, 18.6 s -> 11.2 s -> 3.4 s):
1. the sign-table JOIN over the posexploded components created a
   512M-row intermediate at sf10 — replaced by per-row HOF folds;
2. DECIMAL-accumulating folds were ~500M BigDecimal ops — replaced by
   PURE-DOUBLE sequential folds, the knn_brute_force/_D_DOT idiom the
   oracle mirrors exactly (same order => same doubles), with each
   cosine rounded to an exact DECIMAL at 6dp BEFORE the distortion
   difference, so no unrounded double ever crosses engines.
Final shape: one projection pass (16 folds/row inside codegen, norms
hoisted pre-join — the knn lesson), ONE row-level self-join on
vec_id+1 carrying both spaces' arrays, one groupBy(label).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

RP_DIN = 64
RP_DOUT = 16


def _signs_py() -> list[list[int]]:
    """The deterministic 64x16 ±1 sign matrix — standard md5 parity,
    byte-identical to the SQL oracle's md5(i || '_' || j) derivation
    (hashlib and both engines implement the same MD5)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for j in range(RP_DOUT)
        ]
        for i in range(RP_DIN)
    ]


def _fold_dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over double arrays — the
    knn_brute_force idiom; DuckDB's list_reduce mirrors it exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _round6(col: Column) -> Column:
    return F.round(col.cast("decimal(24,10)"), 6).cast("decimal(24,6)")


def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    signs = _signs_py()
    # r14: the DOUT projection columns ride ONE packed sign-matrix
    # literal and a single transform lambda instead of DOUT unrolled
    # fold expressions (the _cell_scores/_argmin_struct lesson: the
    # unrolled form duplicates the lambda body and its 64-literal
    # array DOUT times, and planning dominates this byte-small op).
    # The per-column fold is unchanged, so y is bit-identical.
    signs_packed = F.array(
        *[
            F.array(*[F.lit(float(signs[i][j])) for i in range(RP_DIN)])
            for j in range(RP_DOUT)
        ]
    )
    y_col = F.transform(
        signs_packed,
        lambda sv: F.aggregate(
            F.zip_with(
                "embedding",
                sv,
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
    )
    # norms hoisted BEFORE the pair join (computed once per row, not
    # once per pair — the knn_brute_force lesson)
    base = emb.select(
        "vec_id",
        "label",
        "embedding",
        y_col.alias("y"),
    )
    # persisted: BOTH sides of the self-join consume this frame and
    # its recompute is the expensive part (16 projection folds per
    # row) even though it crosses no shuffle — sf10 interleaved
    # min-of-3 measured 7.3 s -> 2.0 s (vs DuckDB 2.2 s: ahead)
    base = base.select(
        "vec_id",
        "label",
        "embedding",
        "y",
        F.sqrt(_fold_dot(F.col("embedding"), F.col("embedding"))).alias("ne"),
        F.sqrt(_fold_dot(F.col("y"), F.col("y"))).alias("ny"),
    ).persist()
    a = base.select(
        F.col("vec_id").alias("va"),
        "label",
        F.col("embedding").alias("ea"),
        F.col("y").alias("ya"),
        F.col("ne").alias("nea"),
        F.col("ny").alias("nya"),
    )
    b = base.select(
        (F.col("vec_id") - 1).alias("va"),
        F.col("embedding").alias("eb"),
        F.col("y").alias("yb"),
        F.col("ne").alias("neb"),
        F.col("ny").alias("nyb"),
    )
    pairs = a.join(b, "va").filter(
        (F.col("nea") > 0) & (F.col("neb") > 0) & (F.col("nya") > 0) & (F.col("nyb") > 0)
    )
    # both cosines rounded to exact decimals before differencing: the
    # distortion arithmetic below never touches an unrounded double
    scored = pairs.select(
        "label",
        _round6(
            _fold_dot(F.col("ea"), F.col("eb")) / (F.col("nea") * F.col("neb"))
        ).alias("cos_o"),
        _round6(
            _fold_dot(F.col("ya"), F.col("yb")) / (F.col("nya") * F.col("nyb"))
        ).alias("cos_p"),
    )
    err = scored.select("label", F.abs(F.col("cos_o") - F.col("cos_p")).alias("rerr"))
    return (
        err.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                (F.sum("rerr").cast("double") / F.count(F.lit(1))).cast(
                    "decimal(24,10)"
                ),
                6,
            )
            .cast("double")
            .alias("mean_abs_err"),
            F.max("rerr").cast("double").alias("max_abs_err"),
        )
        .orderBy("label")
    )


def _duck_fold_dot(a: str, b: str, d: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) FOR i IN range(1, {d + 1})]), "
        f"(x, y) -> x + y)"
    )


def _rp_sql() -> str:
    from icechunk_spark.oracle_util import duck_hex2int

    hex2int = duck_hex2int("hh")
    dot_ee = _duck_fold_dot("a.embedding", "b.embedding", RP_DIN)
    naa = _duck_fold_dot("a.embedding", "a.embedding", RP_DIN)
    nbb = _duck_fold_dot("b.embedding", "b.embedding", RP_DIN)
    dot_yy = _duck_fold_dot("a.y", "b.y", RP_DOUT)
    nya = _duck_fold_dot("a.y", "a.y", RP_DOUT)
    nyb = _duck_fold_dot("b.y", "b.y", RP_DOUT)
    return f"""
WITH signs AS (
  SELECT j, list(CAST(s AS DOUBLE) ORDER BY i) AS sv
  FROM (SELECT i, j,
               CASE WHEN ({hex2int}) % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM (SELECT i, j,
                     substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 8) AS hh
              FROM generate_series(0, {RP_DIN - 1}) t(i),
                   generate_series(0, {RP_DOUT - 1}) u(j)))
  GROUP BY j
), sm AS (
  SELECT list(sv ORDER BY j) AS m FROM signs
), proj AS (
  SELECT vec_id, label, embedding,
         [list_reduce(list_prepend(CAST(0 AS DOUBLE),
            [CAST(embedding[i] AS DOUBLE) * m[j][i] FOR i IN range(1, {RP_DIN + 1})]),
            (x, y) -> x + y) FOR j IN range(1, {RP_DOUT + 1})] AS y
  FROM embeddings, sm
), pairs AS (
  SELECT a.label,
         CAST(round(CAST({dot_ee} / (sqrt({naa}) * sqrt({nbb})) AS DECIMAL(24,10)), 6)
              AS DECIMAL(24,6)) AS cos_o,
         CAST(round(CAST({dot_yy} / (sqrt({nya}) * sqrt({nyb})) AS DECIMAL(24,10)), 6)
              AS DECIMAL(24,6)) AS cos_p
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
  WHERE sqrt({naa}) > 0 AND sqrt({nbb}) > 0 AND sqrt({nya}) > 0 AND sqrt({nyb}) > 0
), err AS (
  SELECT label, abs(cos_o - cos_p) AS rerr FROM pairs
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(round(CAST(CAST(sum(rerr) AS DOUBLE) / count(*) AS DECIMAL(24,10)), 6)
            AS DOUBLE) AS mean_abs_err,
       CAST(max(rerr) AS DOUBLE) AS max_abs_err
FROM err GROUP BY label ORDER BY label
"""


RANDOM_PROJECTION_SQL = _rp_sql()


QUERIES = {
    "random_projection": random_projection,
}

ORACLES = {
    "random_projection": RANDOM_PROJECTION_SQL,
}
