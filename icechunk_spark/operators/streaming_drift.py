"""Streaming drift monitor (SURVEY.md §2g extension): the streaming
twin of ``value_drift_psi`` (anomaly_ext.py).  The STREAM maintains
the per-(day, event_type, value-bin) histogram incrementally — the
part whose input is unbounded — and the day-over-day PSI is scored on
the drained histogram, which is bounded by days x types x bins no
matter how many events flow (the monitor-state-vs-event-volume
separation a production drift pipeline relies on).

PSI convention is identical to the batch operator (PSI_BIN_WIDTH
buckets, PSI_SMOOTH Laplace smoothing over the UNION of bins present
in either day, per-term DECIMAL(24,12) rounding before the sum); here
the reference window is the previous calendar day instead of the
batch op's fixed half-split, because "yesterday vs today" is the
schedule a continuously-running monitor actually evaluates.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.operators.anomaly_ext import PSI_BIN_WIDTH, PSI_SMOOTH
from icechunk_spark.streaming.events import read_event_stream, run_to_memory


def _daily_bin_counts_stream(events: DataFrame) -> DataFrame:
    return events.groupBy(
        F.to_date("ts").alias("d"),
        "event_type",
        F.floor(F.col("value") / PSI_BIN_WIDTH).cast("int").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))


def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"psidrift_{uuid.uuid4().hex[:8]}"
    from icechunk_spark.streaming.events import _stream_dir, scaled_state_partitions

    # 8 files/trigger (r11 convention: commutative complete-mode agg)
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    # volume-derived state partitions (r14, same rationale as the
    # other stateful drains)
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(_daily_bin_counts_stream(ev), name, output_mode="complete")
    return psi_over_counts(spark, name)


def psi_over_counts(spark: SparkSession, name: str) -> DataFrame:
    """Day-over-day PSI scored on a drained (d, event_type, bin, n)
    histogram table — bounded by days x types x bins."""
    # the self-join needs fresh expression ids on one side: alias
    # EVERY prv column (an unaliased passthrough keeps the original
    # exprId and Catalyst rejects the join as ambiguous)
    cur = spark.table(name).select(
        "d", "event_type", "bin", F.col("n").alias("c2")
    )
    prv = spark.table(name).select(
        F.date_add("d", 1).alias("pd"),
        F.col("event_type").alias("pet"),
        F.col("bin").alias("pbin"),
        F.col("n").alias("c1"),
    )
    m = cur.join(
        prv,
        (F.col("d") == F.col("pd"))
        & (F.col("event_type") == F.col("pet"))
        & (F.col("bin") == F.col("pbin")),
        "full_outer",
    ).select(
        F.coalesce("d", "pd").alias("d"),
        F.coalesce("event_type", "pet").alias("event_type"),
        F.coalesce("bin", "pbin").alias("bin"),
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    tot = m.groupBy("d", "event_type").agg(
        F.sum("c1").alias("t1"),
        F.sum("c2").alias("t2"),
        F.count(F.lit(1)).alias("nb"),
    )
    j = m.join(tot, ["d", "event_type"]).filter(
        (F.col("t1") > 0) & (F.col("t2") > 0)
    )
    p1 = (F.col("c1") + PSI_SMOOTH) / (F.col("t1") + PSI_SMOOTH * F.col("nb"))
    p2 = (F.col("c2") + PSI_SMOOTH) / (F.col("t2") + PSI_SMOOTH * F.col("nb"))
    term = F.round(((p2 - p1) * F.log(p2 / p1)).cast("decimal(24,12)"), 9)
    return (
        j.select("d", "event_type", term.alias("term"))
        .groupBy("d", "event_type")
        .agg(F.round(F.sum("term"), 6).cast("double").alias("psi"))
        .orderBy("d", "event_type")
    )


STREAM_PSI_DRIFT_SQL = f"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS d, event_type,
         CAST(floor(value / {PSI_BIN_WIDTH}) AS INT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), cur AS (
  SELECT d, event_type, bin, n AS c2 FROM c
), prv AS (
  SELECT d + 1 AS d, event_type, bin, n AS c1 FROM c
), m AS (
  SELECT d, event_type, bin,
         COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
  FROM cur FULL OUTER JOIN prv USING (d, event_type, bin)
), tot AS (
  SELECT d, event_type,
         CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c2) AS BIGINT) AS t2,
         count(*) AS nb
  FROM m GROUP BY 1, 2
)
SELECT m.d, m.event_type,
       CAST(round(sum(round(CAST(((m.c2 + {PSI_SMOOTH}) / (t.t2 + {PSI_SMOOTH} * t.nb)
                                  - (m.c1 + {PSI_SMOOTH}) / (t.t1 + {PSI_SMOOTH} * t.nb))
                                 * ln(((m.c2 + {PSI_SMOOTH}) / (t.t2 + {PSI_SMOOTH} * t.nb))
                                      / ((m.c1 + {PSI_SMOOTH}) / (t.t1 + {PSI_SMOOTH} * t.nb)))
                            AS DECIMAL(24,12)), 9)), 6) AS DOUBLE) AS psi
FROM m JOIN tot t ON m.d = t.d AND m.event_type = t.event_type
WHERE t.t1 > 0 AND t.t2 > 0
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "stream_psi_drift": stream_psi_drift,
}

ORACLES = {
    "stream_psi_drift": STREAM_PSI_DRIFT_SQL,
}
