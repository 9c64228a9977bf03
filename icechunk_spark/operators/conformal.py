"""Conformal outlier detection over embeddings (SURVEY.md §2d
extension): distribution-free anomaly flags with a FINITE-SAMPLE
guarantee — the per-label conformal p-value of each vector's L2 norm
is p_i = #{j in label: s_j >= s_i} / n_label, and flagging p <= alpha
marks (almost exactly) an alpha fraction per label REGARDLESS of the
score distribution (split/full conformal validity under
exchangeability — Vovk et al., "Algorithmic Learning in a Random
World").  That calibration-free false-positive budget is why
monitoring pipelines use conformal scores over z-thresholds when the
data is non-Gaussian.

Exactness: scores round to 6dp BEFORE ranking (the round-before-rank
contract), the tie-inclusive count #{s_j >= s_i} is an INTEGER from a
RANGE-frame window (ties share the frame on both engines), and the
alpha test is pure integers (20*k <= n  <=>  k/n <= 0.05) — no float
boundary anywhere.

Scale note: the rank window is PARTITIONED BY label (parallelism =
#labels).  At 10^9 rows per label you'd switch to the two-phase
bounded-support shape (per-(label, score-bucket) partials + a tiny
cumulative — the cusum/length_mad replan); at profile scales the
window is the clearer plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import l2_norm

CONF_ALPHA_NUM = 1  # alpha = 1/20 = 0.05
CONF_ALPHA_DEN = 20


def conformal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    scored = emb.select(
        "vec_id",
        "label",
        F.round(l2_norm(F.col("embedding")), 6).alias("s6"),
    )
    w = (
        Window.partitionBy("label")
        .orderBy(F.col("s6").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.select(
        "label",
        F.count(F.lit(1)).over(w).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("n"),
    )
    return (
        ranked.groupBy("label")
        .agg(
            F.max("n").cast("bigint").alias("n_vectors"),
            F.sum(
                (F.col("k") * CONF_ALPHA_DEN <= F.col("n") * CONF_ALPHA_NUM).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .select(
            "label",
            "n_vectors",
            "n_flagged",
            (
                F.expr("(20000 * n_flagged + n_vectors) div (2 * n_vectors)")
                / 10000.0
            ).alias("frac_flagged"),
        )
        .orderBy("label")
    )


CONFORMAL_OUTLIERS_SQL = f"""
WITH scored AS (
  SELECT vec_id, label,
         round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]),
               (a, b) -> a + b)), 6) AS s6
  FROM embeddings
), ranked AS (
  SELECT label,
         count(*) OVER (PARTITION BY label ORDER BY s6 DESC
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
         count(*) OVER (PARTITION BY label) AS n
  FROM scored
), agg AS (
  SELECT label,
         CAST(max(n) AS BIGINT) AS n_vectors,
         CAST(sum(CAST(k * {CONF_ALPHA_DEN} <= n * {CONF_ALPHA_NUM} AS INT)) AS BIGINT)
           AS n_flagged
  FROM ranked GROUP BY label
)
SELECT label, n_vectors, n_flagged,
       ((20000 * n_flagged + n_vectors) // (2 * n_vectors)) / 10000.0 AS frac_flagged
FROM agg ORDER BY label
"""


QUERIES = {
    "conformal_outliers": conformal_outliers,
}

ORACLES = {
    "conformal_outliers": CONFORMAL_OUTLIERS_SQL,
}
