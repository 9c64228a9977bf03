"""Driver-facing streaming queries (SURVEY.md §2g): each drains the
bounded event stream with availableNow and returns the final table, so
the DuckDB oracle (plain windowed SQL over the same file) must agree —
streaming and batch semantics coincide once the stream is drained."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from icechunk_spark.streaming.events import (
    _stream_dir,
    dedup_stream,
    purchase_click_join_stream,
    read_event_stream,
    run_to_memory,
    running_totals_stream,
    scaled_state_partitions,
    sessionize_stream,
    windowed_agg_stream,
    zscore_alerts_stream,
)

# State partitions for every built-in-stateful drain below are
# volume-derived (scaled_state_partitions): each stateful operator
# instantiates one state store per shuffle partition with a fixed
# per-batch load+commit cost, which dominates bounded drains at small
# volume (r14, interleaved 32-vs-2 partitions at sf0.1: windowed_agg
# 7.7->1.8 s, topk 2.6->1.3, static_enrich 5.3->1.9 — same cap rule as
# the interval join, so at-scale parallelism is untouched).  The two
# applyInPandasWithState ops (running_totals, zscore_alerts) are left
# on session parallelism deliberately: their partition count is also
# the PYTHON-WORKER fan-out per batch, a compute knob at volume, and
# their measured state-floor saving was marginal (5.9->5.4 s).


def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"wagg_{uuid.uuid4().hex[:8]}"
    # trigger cadence is protocol for commutative complete-mode aggs
    # (r11: 1-file cadence = ~0.85 s/micro-batch floor x 32 files at
    # sf10; 8 files/trigger measured 27.4 -> 4.8 s on the quantile
    # twin) — same convention as the hll/quantile/census twins
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(windowed_agg_stream(ev), name, output_mode="complete")
    # stream processes in LTZ (watermark requirement); session tz is UTC
    # so the NTZ cast is exact and matches the naive oracle
    return (
        spark.table(name)
        .withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
        .orderBy("window_start", "event_type")
    )


STREAM_WINDOWED_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup drained UNTHROTTLED into a PARQUET sink.

    Unthrottled (r14): dropDuplicatesWithinWatermark expires an id's
    state once the watermark passes its first-seen time + delay, so a
    multi-file non-time-ordered replay drained file-per-trigger could
    re-emit an id whose duplicate arrives after expiry — one batch
    sees the whole bounded replay, which is exactly the distinct the
    oracle computes, at every layout (the stream_interval_join /
    stream_zscore_alerts contract).  Parquet sink because the output
    is EVENT VOLUME (10 M rows at sf10): the memory sink parks it on
    the driver and every downstream read is a serial LocalTableScan
    (the census-twin lesson, ~5 s per 4 M rows).  State partitions
    are volume-derived (scaled_state_partitions)."""
    from icechunk_spark.streaming.events import (
        _stream_dir,
        run_to_parquet,
        scaled_state_partitions,
    )

    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=None)
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        deduped = run_to_parquet(spark, dedup_stream(ev), prefix="icdedup")
    return (
        deduped
        .select(
            "event_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
    )


STREAM_DEDUP_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn FROM events) t
WHERE rn = 1
ORDER BY event_id
"""


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation with a full-equality oracle:
    Spark's session_window is half-open ([ts, ts+gap) per event,
    sessions merge on overlap), so a new session starts when
    ts >= prev + gap — one comparison different from the batch
    ``sessionize`` operator's closed-boundary convention, and the
    oracle mirrors it with the same lag/cumsum derivation.
    session_end is last event + gap by definition."""
    # UNTHROTTLED (r14): session-window aggregation filters input rows
    # behind the watermark EVEN IN COMPLETE MODE (unlike tumbling
    # windows, where complete mode retains everything — measured: 0
    # mismatches at any cadence), so over a multi-file non-time-ordered
    # replay a throttled drain loses sessions (sf10: 653k of the batch
    # answer's ~4.9M survive file-per-trigger).  One batch sees the
    # whole bounded replay — the stream_interval_join contract; it is
    # also the cheapest drain (complete mode re-emits every session
    # per batch, so fewer batches = fewer full re-emissions)
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=None)
    # foreachBatch-parquet drain: sessions are DATA VOLUME (9.5 M rows
    # at sf10) and complete mode would park them all on the driver in
    # the memory sink; the executor-written sink keeps the pipeline
    # distributed end to end (run_to_parquet_complete)
    from icechunk_spark.streaming.events import run_to_parquet_complete

    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        sessions = run_to_parquet_complete(
            spark, sessionize_stream(ev), prefix="icsess"
        )
    return (
        sessions
        .withColumn("session_start", F.col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", F.col("session_end").cast("timestamp_ntz"))
        .orderBy("user_id", "session_start")
    )


STREAM_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
  FROM marked
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, sess_seq
ORDER BY user_id, session_start
"""


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful running totals; after draining, the latest state
    per user (max n_events — counts are monotone) must equal the plain
    batch aggregate."""
    name = f"rt_{uuid.uuid4().hex[:8]}"
    # 8 files/trigger: running totals are commutative and the reader
    # takes the max-n_events row per user, so cadence is protocol;
    # fewer batches = fewer per-user update rows through the sink
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    run_to_memory(running_totals_stream(ev), name, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            # exact integer micro-units -> dollars; matches the oracle's
            # per-row DECIMAL(18,6) quantization + exact sum
            F.round(F.col("total_micros") / 1_000_000, 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


STREAM_RUNNING_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: each event enriched against the (broadcast)
    customer dimension, then aggregated per nation.  The static side
    is re-read per micro-batch by Spark — the canonical slowly-
    changing-dimension enrichment — and never shuffles the stream."""
    from pyspark.sql.functions import broadcast

    from icechunk_spark.catalog import load_tables
    from icechunk_spark.functions import money_sum

    name = f"enr_{uuid.uuid4().hex[:8]}"
    # 8 files/trigger (r11 convention: commutative complete-mode agg)
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    cust = load_tables(spark, sf_dir)["customer"].select("c_custkey", "c_nationkey")
    enriched = ev.join(broadcast(cust), ev.user_id == cust.c_custkey)
    agg = enriched.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    )
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).orderBy("c_nationkey")


STREAM_STATIC_ENRICH_SQL = """
SELECT c_nationkey,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join drained with availableNow; the
    reader is UNTHROTTLED so the bounded replay genuinely arrives in
    one batch — no row falls behind the watermark and the result
    equals the batch interval join AT EVERY LAYOUT.  (r14: the default
    one-file-per-trigger throttle only satisfied that contract for
    single-file sources; over a multi-file directory the part files
    arrive in mod-time order, not event-time order, so the watermark
    advanced past most rows and the join silently dropped them as late
    — measured at sf10: 245 of the batch answer's 37 100 rows, in 33
    micro-batches costing 172 s; unthrottled returns all 37 100 in one
    batch, 11 s.  The stream_zscore_alerts precedent, same reason.)

    State partitions are volume-derived (scaled_state_partitions): a
    stream-stream join holds four state stores per shuffle partition,
    each with a fixed per-batch commit cost that dominates small
    drains (measured ~linear in partition count at sf0.1)."""
    from icechunk_spark.streaming.events import _stream_dir, scaled_state_partitions

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=None)
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(purchase_click_join_stream(ev), name)
    return spark.table(name).orderBy("purchase_id", "click_id")


STREAM_INTERVAL_JOIN_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id AS user_id, p.value AS purchase_value
FROM events p
JOIN events c ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
"""


def stream_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: per-(event_type, user) value totals
    maintained by the streaming aggregation (complete mode), top-3
    users per event type ranked after the drain.  The streaming state
    is O(event_types × users) aggregates — the rank itself is a tiny
    batch window over the final table (≤ users rows), which is how a
    production leaderboard reads its serving store."""
    from icechunk_spark.functions import money_sum

    name = f"topk_{uuid.uuid4().hex[:8]}"
    # 8 files/trigger (r11 convention: commutative complete-mode agg)
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    agg = ev.groupBy("event_type", "user_id").agg(
        money_sum("value").alias("total_value")
    )
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(agg, name, output_mode="complete")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        spark.table(name)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "user_id", "total_value")
        .orderBy("event_type", "rnk")
    )


STREAM_TOPK_USERS_SQL = """
SELECT event_type, rnk, user_id, total_value FROM (
  SELECT event_type, user_id,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) DESC,
                    user_id
         ) AS rnk
  FROM events GROUP BY event_type, user_id
) t
WHERE rnk <= 3
ORDER BY event_type, rnk
"""


def stream_zscore_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming anomaly census: the trailing-window z-score
    alert counter maintained per user by applyInPandasWithState (state
    = a bounded 10-value deque per user), drained and compared against
    the BATCH rolling-z oracle — the stream twin of
    operators/anomaly_ext.rolling_zscore_anomalies, value-identical
    after the drain.  The latest state row per user wins (n_scored is
    monotone); users that never accumulated a scoreable frame are
    absent from both sides.

    The reader is UNTHROTTLED (no maxFilesPerTrigger): the availableNow
    drain processes the whole bounded replay in one micro-batch, so the
    in-batch (ts, event_id) sort establishes event order for ANY file
    layout — a throttled multi-file source delivers files in mod-time
    order, which need not be event-time order, and a trailing-window
    statistic is order-sensitive.  Cross-batch state correctness (a
    production stream delivering time-ordered batches) is pinned
    separately in tests/test_streaming.py."""
    name = f"zal_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=None)
    run_to_memory(zscore_alerts_stream(ev), name, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_scored"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("n_scored") > 0))
        .select("user_id", "n_scored", "n_anomalies", "max_abs_z")
        .orderBy("user_id")
    )


QUERIES = {
    "stream_windowed_agg": stream_windowed_agg,
    "stream_topk_users": stream_topk_users,
    "stream_dedup": stream_dedup,
    "stream_sessionize": stream_sessionize,
    "stream_running_totals": stream_running_totals,
    "stream_interval_join": stream_interval_join,
    "stream_static_enrich": stream_static_enrich,
    "stream_zscore_alerts": stream_zscore_alerts,
}


from icechunk_spark.operators.anomaly_ext import (  # noqa: E402 — shared oracle
    ROLLING_ZSCORE_SQL as _ROLLING_ZSCORE_SQL,
)

ORACLES = {
    "stream_static_enrich": STREAM_STATIC_ENRICH_SQL,
    "stream_topk_users": STREAM_TOPK_USERS_SQL,
    "stream_windowed_agg": STREAM_WINDOWED_SQL,
    "stream_dedup": STREAM_DEDUP_SQL,
    "stream_sessionize": STREAM_SESSIONIZE_SQL,
    "stream_running_totals": STREAM_RUNNING_TOTALS_SQL,
    "stream_interval_join": STREAM_INTERVAL_JOIN_SQL,
    "stream_zscore_alerts": _ROLLING_ZSCORE_SQL,
}
