"""CUSUM changepoint detection over the events stream (SURVEY.md §2b
extension; completes the monitoring triple with rolling_zscore_anomalies
and value_drift_psi): per event_type, the classic cumulative-sum
statistic S_i = Σ_{j<=i}(x_j − µ) whose maximum |S| locates the most
likely level-shift point.

Exactness contract (the integer-cents lesson): µ = sum/n is fractional,
so compare n·S_i = n·cumsum_i − i·sum instead — pure BIGINT arithmetic,
bit-identical under any partitioning on both engines.  The reported
magnitude divides back through a DECIMAL cast (max|n·S|/(n·100) dollars,
4 dp, exact HALF_UP).  Argmax tie-break: earliest (ts, event_id).

Shape: one (event_type) shuffle; the cumulative window streams per
type (Spark sort-based window, no state beyond the running sums); the
per-type totals broadcast.  n·cumsum stays inside BIGINT to n ≈ 10^6
rows/type at sf10 cents-scale; at 10^12-row types switch the product
to DECIMAL(38,0) in the same plan (documented, not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    ev = ev.select("event_type", "ts", "event_id", cents.alias("cents"))
    tot = ev.groupBy("event_type").agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    scored = (
        ev.withColumn("csum", F.sum("cents").over(w))
        .withColumn("i", F.row_number().over(w))
        .join(F.broadcast(tot), "event_type")
        .withColumn(
            "ns", F.col("n") * F.col("csum") - F.col("i") * F.col("total")
        )
    )
    best = scored.groupBy("event_type").agg(
        F.max(F.abs("ns")).alias("max_ns"),
        F.max("n").alias("n"),
    )
    # argmax row: earliest (ts, event_id) among |ns| == max
    at = (
        scored.join(best, "event_type")
        .filter(F.abs(F.col("ns")) == F.col("max_ns"))
        .groupBy("event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("at"))
        .select("event_type", F.col("at.event_id").alias("at_event_id"))
    )
    return (
        best.join(at, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                (
                    F.col("max_ns").cast("decimal(38,6)")
                    / (F.col("n").cast("decimal(19,0)") * 100)
                ),
                4,
            )
            .cast("double")
            .alias("max_cusum"),
            "at_event_id",
        )
        .orderBy("event_type")
    )


CUSUM_SQL = """
WITH ev AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), tot AS (
  SELECT event_type, CAST(sum(cents) AS BIGINT) AS total,
         count(*) AS n
  FROM ev GROUP BY event_type
), scored AS (
  SELECT ev.event_type, ts, event_id, n, total,
         CAST(sum(cents) OVER w AS BIGINT) AS csum,
         CAST(row_number() OVER w AS BIGINT) AS i
  FROM ev JOIN tot USING (event_type)
  WINDOW w AS (PARTITION BY ev.event_type ORDER BY ts, event_id)
), ns AS (
  SELECT event_type, ts, event_id, n,
         n * csum - i * total AS ns
  FROM scored
), best AS (
  SELECT event_type, max(abs(ns)) AS max_ns, max(n) AS n
  FROM ns GROUP BY event_type
), at AS (
  SELECT ns.event_type,
         min(struct_pack(ts := ns.ts, event_id := ns.event_id)) AS at
  FROM ns JOIN best ON ns.event_type = best.event_type
                   AND abs(ns.ns) = best.max_ns
  GROUP BY ns.event_type
)
SELECT b.event_type,
       CAST(b.n AS BIGINT) AS n,
       CAST(round(CAST(b.max_ns AS DECIMAL(38,6))
                  / (CAST(b.n AS DECIMAL(19,0)) * 100), 4) AS DOUBLE)
         AS max_cusum,
       at.at.event_id AS at_event_id
FROM best b JOIN at ON b.event_type = at.event_type
ORDER BY b.event_type
"""


QUERIES = {
    "cusum_changepoint": cusum_changepoint,
}

ORACLES = {
    "cusum_changepoint": CUSUM_SQL,
}
