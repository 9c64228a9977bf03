"""Signed random projection (Johnson-Lindenstrauss) for embedding
columns (SURVEY.md §2d extension): the dimensionality-reduction step a
100 TB ANN pipeline runs before indexing — project d=64 vectors onto
k=16 axes whose entries are deterministic ±1 signs (Achlioptas 2001:
database-friendly random projections; the same hash-derived-sign trick
sign-LSH already uses in dedup.embedding_neardup), then AUDIT the
distortion: per label, how far pairwise cosines moved.

The sign matrix is derived in-engine from md5(i || '_' || j) parity —
no randomness, no driver-side state, identical on both engines.

Scale shape: one posexplode of the embedding column, a broadcast join
against the 64x16 sign table, ONE (vec_id, j) aggregation for the
projection, then component-level self-joins on vec_id+1 for the
neighbor-pair cosine audit (the label_pair_similarity pairing — an
equi-join, parallelism scales with data, no global window).  The
projected frame persists: both sides of its self-join would otherwise
recompute the projection aggregation (a shuffle) twice.

Exactness: every float product is rounded to DECIMAL before any sum
(per-term rounding makes sums partition-order-independent and
engine-identical), cosines are doubles derived from those exact
decimal sums, and the reported means go through the DECIMAL(24,10)
intermediate before the 6-digit round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

RP_DIN = 64
RP_DOUT = 16


def _signs(spark: SparkSession) -> DataFrame:
    """The deterministic 64x16 ±1 sign matrix, one row per (i, j)."""
    one = spark.range(1)
    return (
        one.select(
            F.explode(F.sequence(F.lit(0), F.lit(RP_DIN - 1))).alias("i")
        )
        .select(
            "i",
            F.explode(F.sequence(F.lit(0), F.lit(RP_DOUT - 1))).alias("j"),
        )
        .select(
            "i",
            "j",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "_", F.col("i").cast("string"), F.col("j").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )


def _rdec12(col):
    return F.round(col, 12).cast("decimal(30,12)")


def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i", "x"),
    ).withColumn("x", F.col("x").cast("double"))

    proj = (
        comp.join(F.broadcast(_signs(spark)), "i")
        .groupBy("vec_id", "label", "j")
        .agg(F.sum(_rdec12(F.col("x") * F.col("s"))).alias("yd"))
        .select("vec_id", "label", "j", F.col("yd").cast("double").alias("y"))
        .persist()
    )

    def _pair_cos(frame: DataFrame, idx: str, val: str, out: str) -> DataFrame:
        a = frame.select(
            F.col("vec_id").alias("va"),
            F.col("label").alias("label"),
            F.col(idx).alias("ix"),
            F.col(val).alias("xa"),
        )
        b = frame.select(
            (F.col("vec_id") - 1).alias("va"),
            F.col(idx).alias("ix"),
            F.col(val).alias("xb"),
        )
        terms = a.join(b, ["va", "ix"]).select(
            "va",
            "label",
            _rdec12(F.col("xa") * F.col("xb")).alias("tab"),
            _rdec12(F.col("xa") * F.col("xa")).alias("taa"),
            _rdec12(F.col("xb") * F.col("xb")).alias("tbb"),
        )
        sums = terms.groupBy("va", "label").agg(
            F.sum("tab").alias("sab"),
            F.sum("taa").alias("saa"),
            F.sum("tbb").alias("sbb"),
        )
        return sums.filter((F.col("saa") > 0) & (F.col("sbb") > 0)).select(
            "va",
            "label",
            (
                F.col("sab").cast("double")
                / (
                    F.sqrt(F.col("saa").cast("double"))
                    * F.sqrt(F.col("sbb").cast("double"))
                )
            ).alias(out),
        )

    cos_o = _pair_cos(comp, "i", "x", "cos_o")
    cos_p = _pair_cos(proj, "j", "y", "cos_p")
    err = cos_o.join(cos_p, ["va", "label"]).select(
        "label",
        F.round(F.abs(F.col("cos_o") - F.col("cos_p")), 10)
        .cast("decimal(28,10)")
        .alias("rerr"),
    )
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


from icechunk_spark.oracle_util import duck_hex2int as _hex2int


RANDOM_PROJECTION_SQL = f"""
WITH signs AS (
  SELECT i, j,
         CASE WHEN ({_hex2int("hh")}) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM (SELECT i, j, substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 8) AS hh
        FROM generate_series(0, {RP_DIN - 1}) t(i), generate_series(0, {RP_DOUT - 1}) u(j))
), comp AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), proj AS (
  SELECT vec_id, label, j,
         CAST(sum(CAST(round(x * s, 12) AS DECIMAL(30,12))) AS DOUBLE) AS y
  FROM comp JOIN signs USING (i)
  GROUP BY 1, 2, 3
), cos_o AS (
  SELECT a.vec_id AS va, a.label,
         CAST(sum(CAST(round(a.x * b.x, 12) AS DECIMAL(30,12))) AS DOUBLE)
           / (sqrt(CAST(sum(CAST(round(a.x * a.x, 12) AS DECIMAL(30,12))) AS DOUBLE))
              * sqrt(CAST(sum(CAST(round(b.x * b.x, 12) AS DECIMAL(30,12))) AS DOUBLE))) AS cos_o
  FROM comp a JOIN comp b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
  GROUP BY 1, 2
  HAVING sum(CAST(round(a.x * a.x, 12) AS DECIMAL(30,12))) > 0
     AND sum(CAST(round(b.x * b.x, 12) AS DECIMAL(30,12))) > 0
), cos_p AS (
  SELECT a.vec_id AS va, a.label,
         CAST(sum(CAST(round(a.y * b.y, 12) AS DECIMAL(30,12))) AS DOUBLE)
           / (sqrt(CAST(sum(CAST(round(a.y * a.y, 12) AS DECIMAL(30,12))) AS DOUBLE))
              * sqrt(CAST(sum(CAST(round(b.y * b.y, 12) AS DECIMAL(30,12))) AS DOUBLE))) AS cos_p
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
  GROUP BY 1, 2
  HAVING sum(CAST(round(a.y * a.y, 12) AS DECIMAL(30,12))) > 0
     AND sum(CAST(round(b.y * b.y, 12) AS DECIMAL(30,12))) > 0
), err AS (
  SELECT cos_o.label,
         CAST(round(abs(cos_o - cos_p), 10) AS DECIMAL(28,10)) AS rerr
  FROM cos_o JOIN cos_p ON cos_o.va = cos_p.va AND cos_o.label = cos_p.label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(round(CAST(CAST(sum(rerr) AS DOUBLE) / count(*) AS DECIMAL(24,10)), 6)
            AS DOUBLE) AS mean_abs_err,
       CAST(max(rerr) AS DOUBLE) AS max_abs_err
FROM err GROUP BY label ORDER BY label
"""


QUERIES = {
    "random_projection": random_projection,
}

ORACLES = {
    "random_projection": RANDOM_PROJECTION_SQL,
}
