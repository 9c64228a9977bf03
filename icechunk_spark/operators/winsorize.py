"""Per-source winsorization of document lengths (SURVEY.md §2e
extension): clip each source's length distribution at its own exact
nearest-rank p05/p95 before computing mixing statistics — the robust-
scaling step a curation pipeline runs so a handful of pathological
giants (or empty shells) in one source can't dominate its token
budget or its quality aggregates.

Exact nearest-rank percentiles, NOT approx_percentile: cross-engine
determinism (Spark's approx sketch and DuckDB's differ), and the
scale shape doesn't need the sketch — percentiles are read off the
per-(source, length) COUNT frame, which is distinct-length-sized
(bounded by the length domain, not the corpus), with the cumulative
window running over that small frame.  This is the documented
parallelism-collapse escape: no per-source global sort of raw rows,
one map-side-combined groupBy + a window over grouped counts.

Output per source: n docs, the p05/p95 cut lengths, how many rows
each tail clipped, and the 4dp winsorized mean length — in pure
integers (the (2·10^4·num + den) div (2·den) idiom) so both engines
round identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables
from icechunk_spark.engine import local_df

P_LO = 5  # lower winsor percentile
P_HI = 95  # upper winsor percentile


def winsorize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"].select(
        "source", F.length("text").alias("len")
    )
    # distinct-length frame: corpus-sized scan ONCE, window over the
    # small grouped frame only.  It feeds three branches (cum, totals,
    # clip), so persist for the duration of the call and unpersist in
    # the finally below (ADVICE r11: the lazy-return version leaked
    # the cache in long-lived sessions).
    lc = docs.groupBy("source", "len").agg(F.count(F.lit(1)).alias("cnt")).persist()
    w = Window.partitionBy("source").orderBy("len").rowsBetween(
        Window.unboundedPreceding, 0
    )
    try:
        cum = lc.withColumn("cum", F.sum("cnt").over(w))
        tot = lc.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("n"))
        ranked = cum.join(broadcast(tot), "source")
        cuts = ranked.groupBy("source").agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({P_LO} * n + 99) div 100"), F.col("len")
                )
            ).alias("p05"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({P_HI} * n + 99) div 100"), F.col("len")
                )
            ).alias("p95"),
        )
        clipped = lc.join(broadcast(cuts), "source").select(
            "source",
            "cnt",
            (F.col("len") < F.col("p05")).cast("bigint").alias("is_lo"),
            (F.col("len") > F.col("p95")).cast("bigint").alias("is_hi"),
            F.greatest(F.least(F.col("len"), F.col("p95")), F.col("p05")).alias("wlen"),
            "p05",
            "p95",
        )
        rows = (
            clipped.groupBy("source", "p05", "p95")
            .agg(
                F.sum("cnt").cast("bigint").alias("n"),
                F.sum(F.col("cnt") * F.col("is_lo")).cast("bigint").alias("n_clipped_lo"),
                F.sum(F.col("cnt") * F.col("is_hi")).cast("bigint").alias("n_clipped_hi"),
                F.sum(F.col("cnt") * F.col("wlen")).cast("bigint").alias("wsum"),
            )
            .select(
                "source",
                "n",
                "p05",
                "p95",
                "n_clipped_lo",
                "n_clipped_hi",
                (F.expr("(20000 * wsum + n) div (2 * n)") / 10000.0).alias(
                    "winsorized_mean_len"
                ),
            )
            .orderBy("source")
            .collect()
        )
    finally:
        lc.unpersist()
    return local_df(
        spark,
        rows,
        "source string, n bigint, p05 int, p95 int, "
        "n_clipped_lo bigint, n_clipped_hi bigint, winsorized_mean_len double",
    ).orderBy("source")


WINSORIZE_SQL = f"""
WITH lc AS (
  SELECT source, length(text) AS len, count(*) AS cnt
  FROM documents GROUP BY 1, 2
), cum AS (
  SELECT source, len, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY len) AS cum
  FROM lc
), tot AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM lc GROUP BY 1
), cuts AS (
  SELECT c.source,
         min(CASE WHEN cum >= ({P_LO} * n + 99) // 100 THEN len END) AS p05,
         min(CASE WHEN cum >= ({P_HI} * n + 99) // 100 THEN len END) AS p95
  FROM cum c JOIN tot USING (source)
  GROUP BY 1
), clipped AS (
  SELECT lc.source, cnt, p05, p95,
         CASE WHEN len < p05 THEN cnt ELSE 0 END AS lo_cnt,
         CASE WHEN len > p95 THEN cnt ELSE 0 END AS hi_cnt,
         GREATEST(LEAST(len, p95), p05) AS wlen
  FROM lc JOIN cuts USING (source)
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n,
       p05, p95,
       CAST(sum(lo_cnt) AS BIGINT) AS n_clipped_lo,
       CAST(sum(hi_cnt) AS BIGINT) AS n_clipped_hi,
       ((20000 * CAST(sum(cnt * wlen) AS BIGINT) + CAST(sum(cnt) AS BIGINT))
          // (2 * CAST(sum(cnt) AS BIGINT))) / 10000.0 AS winsorized_mean_len
FROM clipped
GROUP BY source, p05, p95
ORDER BY source
"""

QUERIES = {"winsorize_scores": winsorize_scores}
ORACLES = {"winsorize_scores": WINSORIZE_SQL}
