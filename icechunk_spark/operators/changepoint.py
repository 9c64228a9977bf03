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

Shape (the r9 sf10 lesson): a naive per-type cumulative window is ONE
task per event_type — 5 tasks sorting 2M rows each at sf10 (measured
13.4 s vs DuckDB 6.7 s).  The cumsum is therefore two-phase: rows land
in ~CUSUM_BUCKETS fixed time-range buckets per type, per-bucket sums
feed a TINY offset window (#buckets rows per type), and the per-row
window runs PARTITIONED BY (type, bucket) — parallelism = types ×
buckets, identical exact-integer results (n·cumsum − i·total is a pure
function of the ordered prefix, however the prefix is assembled).
n·cumsum stays inside BIGINT to n ≈ 10^6 rows/type at sf10
cents-scale; at 10^12-row types switch the product to DECIMAL(38,0)
in the same plan (documented, not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

CUSUM_BUCKETS = 1024  # time-range buckets per type (cumsum parallelism)


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = ev.select(
        "event_type", "ts", "event_id", cents.alias("cents"), tus.alias("tus")
    )
    # fixed time-range bucket per type: Spark-side parallelism device
    # only — the final statistic is bucket-invariant, so the oracle
    # needs no mirror of it
    rng = ev.agg(F.min("tus").alias("mn"), F.max("tus").alias("mx"))
    ev = ev.join(F.broadcast(rng)).withColumn(
        "b",
        F.floor(
            (F.col("tus") - F.col("mn"))
            / F.greatest(
                F.ceil((F.col("mx") - F.col("mn") + 1) / CUSUM_BUCKETS),
                F.lit(1),
            )
        ).cast("int"),
    )
    tot = ev.groupBy("event_type").agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n")
    )
    # per-(type, bucket) partials -> tiny offset window (#buckets rows)
    parts = ev.groupBy("event_type", "b").agg(
        F.sum("cents").alias("bsum"), F.count(F.lit(1)).alias("bcnt")
    )
    woff = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = parts.select(
        "event_type",
        "b",
        F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("coff"),
        F.coalesce(F.sum("bcnt").over(woff), F.lit(0)).alias("ioff"),
    )
    # per-row window runs per (type, bucket): types x buckets tasks
    wloc = Window.partitionBy("event_type", "b").orderBy("ts", "event_id")
    scored = (
        ev.join(F.broadcast(offs), ["event_type", "b"])
        .withColumn("csum", F.sum("cents").over(wloc) + F.col("coff"))
        .withColumn("i", F.row_number().over(wloc) + F.col("ioff"))
        .join(F.broadcast(tot), "event_type")
        .withColumn(
            "ns", F.col("n") * F.col("csum") - F.col("i") * F.col("total")
        )
    )
    # ONE aggregation finds both the max |ns| and its earliest
    # (ts, event_id) — lexicographic max over (|ns|, -tus, -event_id)
    # avoids the two-consumer recompute of a join-back argmax
    best = scored.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs("ns").alias("a"),
                (-F.col("tus")).alias("nt"),
                (-F.col("event_id")).alias("ne"),
            )
        ).alias("m"),
        F.max("n").alias("n"),
    )
    return best.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (
                F.col("m.a").cast("decimal(38,6)")
                / (F.col("n").cast("decimal(19,0)") * 100)
            ),
            4,
        )
        .cast("double")
        .alias("max_cusum"),
        (-F.col("m.ne")).cast("bigint").alias("at_event_id"),
    ).orderBy("event_type")


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
