"""Daily active / new / returning users (SURVEY.md §2b extension):
the growth-dashboard staple — per day: distinct active users, users
seen for the FIRST time, returning = active − new, and the running
cumulative distinct-user count.

The cumulative-distinct trick (the scale story): cumulative distinct
users through day D equals the count of users whose FIRST day ≤ D —
so one groupBy(user).min(day) pass plus a running sum over the tiny
per-day frame replaces any day-by-day rescan or giant distinct-union
state.  All integers, so both engines agree bit-for-bit.

Scale shape: one groupBy(day, user) distinct pass (map-side
combined), one groupBy(user) first-seen pass over its output, then
day-sized frames only; the window runs over n_days rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables


def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return census_over_day_user(ev.distinct())


def census_over_day_user(day_user: DataFrame) -> DataFrame:
    """The census algebra over ANY distinct (day, user_id) frame —
    shared by the batch op and the streaming twin
    (streaming_active.py) so the two registered queries cannot
    diverge (the quantiles_over_sketch precedent).

    NULL days (from NULL event timestamps) are dropped HERE, in the
    shared algebra (ADVICE r12): a NULL day is not a day, and leaving
    it in diverges cross-engine — Spark's Window.orderBy puts NULLS
    FIRST where DuckDB's ORDER BY puts them LAST, skewing the running
    cumulative sum and the row order."""
    day_user = day_user.filter(F.col("day").isNotNull())
    active = day_user.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    )
    new = (
        day_user.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn(
            "returning_users", (F.col("active_users") - F.col("new_users")).cast("bigint")
        )
        .withColumn(
            "cumulative_distinct_users", F.sum("new_users").over(w).cast("bigint")
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "active_users",
            "new_users",
            "returning_users",
            "cumulative_distinct_users",
        )
        .orderBy("day")
    )


DAILY_ACTIVE_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
  WHERE ts IS NOT NULL
), active AS (
  SELECT day, CAST(count(*) AS BIGINT) AS active_users FROM du GROUP BY day
), firsts AS (
  SELECT user_id, min(day) AS day FROM du GROUP BY user_id
), new AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM firsts GROUP BY day
)
SELECT CAST(a.day AS VARCHAR) AS day,
       a.active_users,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(a.active_users - coalesce(n.new_users, 0) AS BIGINT) AS returning_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY a.day) AS BIGINT)
         AS cumulative_distinct_users
FROM active a LEFT JOIN new n ON a.day = n.day
ORDER BY day
"""

QUERIES = {"daily_active_users": daily_active_users}
ORACLES = {"daily_active_users": DAILY_ACTIVE_SQL}
