"""Additional analytics operators (SURVEY.md §2b widening): advanced
window functions, statistical aggregates, ordered string aggregation,
histogram binning, and time-series gap-fill resampling.

Scale notes:
- Window functions partition on high-cardinality keys (user_id) —
  no single-reducer windows anywhere.
- Gap-fill generates the dense time spine with ``sequence`` + explode
  per group (JVM-side), so the spine is produced distributed, never
  on the driver.
- Statistical aggregates are Catalyst built-ins (partial-aggregable).

Every query has a DuckDB oracle keyed by the same name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_sum


def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas: lead/lag/ntile over event-time windows."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value", 1).over(w), 2).alias("delta_prev"),
            F.round(F.lead("value", 1).over(w) - F.col("value"), 2).alias("delta_next"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("user_id", "event_id")
    )


WINDOW_LEAD_LAG_SQL = """
SELECT user_id, event_id,
       round(value - lag(value, 1) OVER w, 2) AS delta_prev,
       round(lead(value, 1) OVER w - value, 2) AS delta_next,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per event type: stddev, variance,
    correlation and covariance of value vs. hour-of-day."""
    t = load_tables(spark, sf_dir)
    df = t["events"].withColumn("hod", F.hour("ts").cast("double"))
    return (
        df.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.var_samp("value"), 4).alias("var_value"),
            F.round(F.corr("value", "hod"), 4).alias("corr_value_hod"),
            F.round(F.covar_samp("value", "hod"), 4).alias("covar_value_hod"),
        )
        .orderBy("event_type")
    )


STATS_AGG_SQL = """
SELECT event_type,
       round(stddev_samp(value), 4) AS sd_value,
       round(var_samp(value), 4) AS var_value,
       round(corr(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4) AS corr_value_hod,
       round(covar_samp(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4) AS covar_value_hod,
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation: per region, the
    nation names concatenated in name order."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


STRING_AGG_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 buckets over
    [0, 600000)) — the distributed binning primitive."""
    t = load_tables(spark, sf_dir)
    width = 30000.0
    bucket = F.least(
        F.floor(F.col("o_totalprice") / width).cast("int"), F.lit(19)
    )
    return (
        t["orders"]
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_SQL = """
SELECT CAST(least(floor(o_totalprice / 30000.0), 19) AS INT) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY bucket
ORDER BY bucket
"""


def time_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap-filled resample per event type: dense day spine via
    distributed sequence+explode, zero-filled counts, forward-fillable
    totals.  The standard time-series densification pattern."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    return (
        spine.join(daily, ["event_type", "day"], "left_outer")
        .select(
            "event_type",
            F.col("day").cast("timestamp_ntz").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


TIME_RESAMPLE_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         count(*) AS n_events,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)
)
SELECT spine.event_type AS event_type, spine.day AS day,
       coalesce(daily.n_events, 0) AS n_events,
       coalesce(daily.total_value, 0.0) AS total_value
FROM spine
LEFT OUTER JOIN daily ON spine.event_type = daily.event_type AND spine.day = daily.day
ORDER BY spine.event_type, spine.day
"""


def customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers ordering in 1996 split into retained
    (also ordered in 1997 — INTERSECT) vs churned (did not — EXCEPT).
    Both set ops shuffle on the already-distinct custkey only."""
    t = load_tables(spark, sf_dir)

    def buyers(year: int):
        return (
            t["orders"]
            .filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = buyers(1996), buyers(1997)
    retained = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("retained").alias("cohort"), "n"
    )
    churned = y96.exceptAll(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("churned").alias("cohort"), "n"
    )
    return retained.unionByName(churned).orderBy("cohort")


RETENTION_SETOPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996),
     y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1997)
SELECT 'churned' AS cohort, count(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
UNION ALL
SELECT 'retained' AS cohort, count(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
ORDER BY cohort
"""


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass producing the
    day, hour, and per-type granularities via ROLLUP over time buckets
    — the materialization a time-series store keeps per chunk.  At
    100 TB each grouping-set aggregate is partial-combined before one
    shared shuffle (Expand + single exchange, not three scans)."""
    t = load_tables(spark, sf_dir)
    df = (
        t["events"]
        .withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("hour", F.hour("ts").cast("int"))
    )
    return (
        df.rollup("day", "hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "hour",
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy(
            F.asc_nulls_first("day"),
            F.asc_nulls_first("hour"),
            F.asc_nulls_first("event_type"),
        )
    )


HYPERTABLE_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(extract(hour FROM ts) AS INT) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (day, hour, event_type)
ORDER BY day ASC NULLS FIRST, hour ASC NULLS FIRST, event_type ASC NULLS FIRST
"""


def sketch_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation.  The sketch is built
    distributed — Spark's count_min_sketch aggregate merges
    per-partition sketches, so the shuffle carries one small binary
    blob per partition, never the keys.  The sketch value itself is
    engine-specific, so the query emits the exact counts plus a
    boolean asserting the one-sided CMS guarantee (exact <= estimate
    <= exact + eps*N); the oracle produces the same counts with
    within_bounds = TRUE, making the invariant driver-checkable."""
    from icechunk_spark.engine import local_df

    t = load_tables(spark, sf_dir)
    events = t["events"]
    blob = bytes(
        events.agg(
            F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms")
        ).collect()[0]["cms"]
    )
    import io

    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(blob)
    )
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(exact.values())
    eps_bound = int(0.001 * total) + 1  # CMS guarantee: exact <= est <= exact + eps*N
    rows = [
        {
            "event_type": et,
            "exact_count": n,
            "within_bounds": n <= int(cms.estimateCount(et)) <= n + eps_bound,
        }
        for et, n in sorted(exact.items())
    ]
    return local_df(
        spark, rows, "event_type string, exact_count bigint, within_bounds boolean"
    )


SKETCH_EVENT_COUNTS_SQL = """
SELECT event_type,
       count(*) AS exact_count,
       TRUE AS within_bounds
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "window_lead_lag": window_lead_lag,
    "stats_agg": stats_agg,
    "string_agg_ordered": string_agg_ordered,
    "histogram_value": histogram_value,
    "time_resample": time_resample,
    "customer_retention_setops": customer_retention_setops,
    "sketch_event_counts": sketch_event_counts,
    "hypertable_rollup": hypertable_rollup,
}

ORACLES = {
    "window_lead_lag": WINDOW_LEAD_LAG_SQL,
    "stats_agg": STATS_AGG_SQL,
    "string_agg_ordered": STRING_AGG_SQL,
    "histogram_value": HISTOGRAM_SQL,
    "time_resample": TIME_RESAMPLE_SQL,
    "customer_retention_setops": RETENTION_SETOPS_SQL,
    "sketch_event_counts": SKETCH_EVENT_COUNTS_SQL,
    "hypertable_rollup": HYPERTABLE_ROLLUP_SQL,
}
