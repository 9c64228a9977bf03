"""Welch two-sample drift test (SURVEY.md §2b extension): the
parametric companion to value_drift_psi — per event_type, Welch's
t-statistic between the first and second time halves of the value
stream, with the same exact midpoint-split convention.  PSI sees
SHAPE changes bin-by-bin; Welch t answers the narrower-but-sharper
"did the MEAN move relative to sampling noise", which is what a
metrics-regression gate alerts on.

Exactness: per-half moment sums accumulate in integer CENTS (s1, s2
— the seasonal_profile_anomalies pattern), so means and variances
are ratios of exact integers; t and the Welch-Satterthwaite df are
doubles derived from those exact integers through identical
expressions (deterministic on both engines), rounded through the
DECIMAL intermediate.  The drift flag |t| > 1.96 compares an exact
decimal against a literal.  One scan, one tiny broadcast (the
midpoint), one groupBy(event_type) with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

T_CRIT = 1.96  # two-sided 5% normal approximation


def welch_drift_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    # exact midpoint instant (the value_drift_psi convention: floor +
    # integer halving so both engines pin the same microsecond)
    mid = ev.agg(
        (F.min(tus) + F.floor((F.max(tus) - F.min(tus)) / 2))
        .cast("bigint")
        .alias("mid")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    half = (tus > F.col("mid")).cast("int")
    per = (
        ev.join(F.broadcast(mid))
        .select("event_type", half.alias("h"), cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.sum(1 - F.col("h")).alias("n1"),
            F.sum("h").alias("n2"),
            F.sum(F.col("c") * (1 - F.col("h"))).alias("s1"),
            F.sum(F.col("c") * F.col("h")).alias("s2"),
            F.sum(F.col("c") * F.col("c") * (1 - F.col("h"))).alias("q1"),
            F.sum(F.col("c") * F.col("c") * F.col("h")).alias("q2"),
        )
    )
    # sample variance in cents^2: (n*q - s^2) / (n*(n-1)).  The sums
    # are exact BIGINTs; the n*q and s^2 PRODUCTS would overflow
    # bigint at sf0.1+, so every moment enters the formula as an
    # EXPLICIT double, with the SQL mirror casting operand-for-operand
    # — identical IEEE ops on identical inputs are identical results
    nd1, nd2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    sd1, sd2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    qd1, qd2 = F.col("q1").cast("double"), F.col("q2").cast("double")
    v1 = (nd1 * qd1 - sd1 * sd1) / (nd1 * (nd1 - 1.0))
    v2 = (nd2 * qd2 - sd2 * sd2) / (nd2 * (nd2 - 1.0))
    se2 = v1 / nd1 + v2 / nd2
    t = (sd1 / nd1 - sd2 / nd2) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (v1 / nd1) * (v1 / nd1) / (nd1 - 1.0)
        + (v2 / nd2) * (v2 / nd2) / (nd2 - 1.0)
    )
    rt = F.round(t.cast("decimal(24,10)"), 6)
    # zero-variance guard: a constant value stream in both halves
    # gives se2 = 0 exactly (integer-cents sums) and t = x/0 —
    # Spark's decimal cast would NULL it while DuckDB errors on the
    # Infinity cast; the group is filtered identically on both engines
    return per.filter(
        (F.col("n1") >= 2) & (F.col("n2") >= 2) & (se2 > 0)
    ).select(
        "event_type",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        rt.cast("double").alias("t_stat"),
        F.round(dfw.cast("decimal(24,10)"), 4).cast("double").alias("df_welch"),
        (F.abs(rt) > T_CRIT).alias("mean_drifted"),
    ).orderBy("event_type")


WELCH_DRIFT_SQL = f"""
WITH mid AS (
  SELECT CAST(epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS BIGINT) AS mid
  FROM events
), rows_ AS (
  SELECT event_type,
         CAST(epoch_us(ts) > mid AS INT) AS h,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events, mid
), per AS (
  SELECT event_type,
         CAST(sum(1 - h) AS BIGINT) AS n1,
         CAST(sum(h) AS BIGINT) AS n2,
         CAST(sum(c * (1 - h)) AS BIGINT) AS s1,
         CAST(sum(c * h) AS BIGINT) AS s2,
         CAST(sum(c * c * (1 - h)) AS BIGINT) AS q1,
         CAST(sum(c * c * h) AS BIGINT) AS q2
  FROM rows_ GROUP BY event_type
), calc AS (
  SELECT event_type, n1, n2,
         CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2,
         (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
         (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
            - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
           / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
  FROM per WHERE n1 >= 2 AND n2 >= 2
    AND (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
        + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
          / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) > 0
)
SELECT event_type, n1, n2,
       CAST(round(CAST((m1 - m2) / sqrt(v1 / nd1 + v2 / nd2) AS DECIMAL(24,10)), 6)
            AS DOUBLE) AS t_stat,
       CAST(round(CAST(((v1 / nd1 + v2 / nd2) * (v1 / nd1 + v2 / nd2))
                       / ((v1 / nd1) * (v1 / nd1) / (nd1 - 1.0)
                          + (v2 / nd2) * (v2 / nd2) / (nd2 - 1.0)) AS DECIMAL(24,10)), 4)
            AS DOUBLE) AS df_welch,
       abs(round(CAST((m1 - m2) / sqrt(v1 / nd1 + v2 / nd2) AS DECIMAL(24,10)), 6))
         > {T_CRIT} AS mean_drifted
FROM calc
ORDER BY event_type
"""


QUERIES = {
    "welch_drift_ttest": welch_drift_ttest,
}

ORACLES = {
    "welch_drift_ttest": WELCH_DRIFT_SQL,
}
