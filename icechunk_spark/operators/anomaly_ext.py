"""Operational anomaly/drift operators over the events stream
(SURVEY.md §2b extension) — the monitoring pair a production ingest
pipeline runs continuously: per-entity rolling z-score outliers and
population-stability drift between time halves.

Determinism contracts (the money_sum/idf lessons applied to window
frames):
- rolling_zscore_anomalies: the frame's mean/variance come from
  EXACT DECIMAL sums of value and value² over a ROWS frame whose
  membership is totally ordered (ts, event_id tie-break) — Spark's
  incremental sliding-window accumulation and DuckDB's recompute
  then agree bit-for-bit because the sums are exact; the residual
  float ops (divide, sqrt, z) run on identical inputs on both
  engines, and z is DECIMAL-rounded before the threshold test.
- value_drift_psi: fixed-width value bins (never interpolated
  quantile boundaries — a 1-ulp quantile delta would flip bucket
  membership); per-bin PSI terms are DECIMAL-rounded before the sum
  so the Σ is partition-order-independent.

Scale design: one (user_id) shuffle + one window pass for the
z-scores (state = 11-row frame per entity, Spark streams it);
the PSI is two scans' worth of per-(type, bin) partial counts — at
100 TB both are single-shuffle shapes with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

Z_WINDOW = 10  # trailing frame rows (exclusive of the current row)
Z_MIN_N = 5  # minimum frame rows to score
Z_THRESHOLD = 3.0
PSI_BIN_WIDTH = 50.0  # fixed-width value bins (value spans ~0..500)
PSI_SMOOTH = 0.5  # Laplace smoothing per bin


def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-window z-scores; per-user anomaly census."""
    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-Z_WINDOW, -1)
    )
    # events.value is cents-quantized (asserted in tests): integer
    # cents make the sliding sums EXACT with plain bigint arithmetic —
    # measured 2.3× faster than DECIMAL sliding sums at sf10 (10M
    # rows), same bit-for-bit result because z is scale-invariant
    # ((x-µ)/σ is identical in cents and in dollars)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    ev = ev.withColumn("cents", cents)
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("cents").over(w)
    s2 = F.sum(F.col("cents") * F.col("cents")).over(w)
    mean = s1.cast("double") / n
    # sample variance from exact sums; guard tiny negatives from the
    # float subtraction (identical on both engines, but clamp anyway)
    var = F.greatest(
        (s2.cast("double") - n * mean * mean) / (n - 1), F.lit(0.0)
    )
    z = F.round(
        ((F.col("cents") - mean) / F.sqrt(var)).cast("decimal(24,12)"), 6
    ).cast("double")
    scored = (
        ev.select("event_id", "user_id", "ts", "cents")
        .withColumn("frame_n", n)
        .withColumn("z", z)
        .filter((F.col("frame_n") >= Z_MIN_N) & F.col("z").isNotNull())
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum((F.abs(F.col("z")) > Z_THRESHOLD).cast("bigint")).alias(
                "n_anomalies"
            ),
            F.max(F.abs(F.col("z"))).alias("max_abs_z"),
        )
        .orderBy("user_id")
    )


ROLLING_ZSCORE_SQL = f"""
WITH scored AS (
  SELECT user_id, cents,
         count(*) OVER w AS frame_n,
         CAST(sum(cents) OVER w AS DOUBLE) AS s1,
         CAST(sum(cents * cents) OVER w AS DOUBLE) AS s2
  FROM (SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {Z_WINDOW} PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT user_id,
         CAST(round(CAST((cents - s1 / frame_n)
                         / sqrt(greatest((s2 - frame_n * (s1 / frame_n) * (s1 / frame_n))
                                         / (frame_n - 1), 0.0))
                         AS DECIMAL(24,12)), 6) AS DOUBLE) AS z
  FROM scored WHERE frame_n >= {Z_MIN_N}
)
SELECT user_id, count(*) AS n_scored,
       CAST(sum(CAST(abs(z) > {Z_THRESHOLD} AS BIGINT)) AS BIGINT) AS n_anomalies,
       max(abs(z)) AS max_abs_z
FROM z WHERE z IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution per
    event_type between the first and second time halves (split at the
    median ts via exact min/max midpoint — a fixed instant, not a
    quantile)."""
    ev = load_tables(spark, sf_dir)["events"]
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    # floor the half-range explicitly: cast(double -> bigint) TRUNCATES
    # in Spark but ROUNDS in DuckDB, so on an odd (max-min) span the
    # engines' midpoints differ by 1 µs and an event at exactly that
    # instant lands in different halves.  floor()+integer-// on both
    # engines pins the same instant (span is non-negative, floor==trunc)
    mid = ev.agg(
        (F.min(tus) + F.floor((F.max(tus) - F.min(tus)) / 2))
        .cast("bigint")
        .alias("mid")
    )
    b = F.floor(F.col("value") / PSI_BIN_WIDTH).cast("int").alias("bin")
    half = (tus > F.col("mid")).cast("int").alias("half")
    binned = ev.join(F.broadcast(mid)).select("event_type", b, half)
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(1 - F.col("half")).alias("c1"), F.sum("half").alias("c2")
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    nbins = counts.groupBy("event_type").agg(F.count(F.lit(1)).alias("nb"))
    j = counts.join(tot, "event_type").join(nbins, "event_type")
    p1 = (F.col("c1") + PSI_SMOOTH) / (F.col("t1") + PSI_SMOOTH * F.col("nb"))
    p2 = (F.col("c2") + PSI_SMOOTH) / (F.col("t2") + PSI_SMOOTH * F.col("nb"))
    term = F.round(((p2 - p1) * F.log(p2 / p1)).cast("decimal(24,12)"), 9)
    return (
        j.select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term"), 6).cast("double").alias("psi"))
        .orderBy("event_type")
    )


VALUE_DRIFT_PSI_SQL = f"""
WITH mid AS (
  SELECT CAST(epoch_us(min(ts)) + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS BIGINT) AS mid
  FROM events
), binned AS (
  SELECT event_type,
         CAST(floor(value / {PSI_BIN_WIDTH}) AS INT) AS bin,
         CAST(epoch_us(ts) > mid AS INT) AS half
  FROM events, mid
), counts AS (
  SELECT event_type, bin,
         CAST(sum(1 - half) AS BIGINT) AS c1,
         CAST(sum(half) AS BIGINT) AS c2
  FROM binned GROUP BY event_type, bin
), tot AS (
  SELECT event_type, CAST(sum(c1) AS BIGINT) AS t1,
         CAST(sum(c2) AS BIGINT) AS t2, count(*) AS nb
  FROM counts GROUP BY event_type
)
SELECT c.event_type,
       CAST(round(sum(round(CAST(((c.c2 + {PSI_SMOOTH}) / (t.t2 + {PSI_SMOOTH} * t.nb)
                   - (c.c1 + {PSI_SMOOTH}) / (t.t1 + {PSI_SMOOTH} * t.nb))
                  * ln(((c.c2 + {PSI_SMOOTH}) / (t.t2 + {PSI_SMOOTH} * t.nb))
                       / ((c.c1 + {PSI_SMOOTH}) / (t.t1 + {PSI_SMOOTH} * t.nb)))
                  AS DECIMAL(24,12)), 9)), 6) AS DOUBLE) AS psi
FROM counts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type ORDER BY c.event_type
"""


# --- seasonal (weekday x hour) profile anomalies --------------------------

SEASONAL_K = 2  # flag |x - mean| > K * sigma_pop; the predicate is integer-exact


def seasonal_profile_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third monitoring axis after trailing z-scores (local
    spikes) and PSI (distribution drift): SEASONALITY.  Events are
    profiled per (event_type, weekday, hour) cell, and each event is
    flagged against its own cell's mean/variance — the baseline that
    catches "normal for Monday 09:00, anomalous for Sunday 03:00"
    which a trailing window blurs across the week.

    Determinism: values go to integer cents (the rolling-z pattern),
    so the per-cell sums s1=Σx and s2=Σx² are EXACT integers, and the
    flag predicate |x−mean| > K·σ is evaluated without ever forming a
    float: (n·x − s1)² > K²·(n·s2 − s1²) — both sides exact integers
    (DECIMAL(38,0)/HUGEINT so the squares cannot overflow), so the
    engines cannot disagree at the boundary.  The two rounded output
    ratios use the DECIMAL-cast-then-round pattern.

    Scale: two scans of events (profile, then flag) + one broadcast
    of the ≤ |types|·168-row profile; both aggregates are map-side
    combined single-shuffle shapes.  dow is ISO Monday=0 on both
    engines (Spark weekday(); DuckDB isodow()-1)."""
    ev = (
        load_tables(spark, sf_dir)["events"]
        .select(
            "event_type",
            F.expr("weekday(ts)").alias("dow"),
            F.hour("ts").alias("hr"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("xc"),
        )
    )
    prof = ev.groupBy("event_type", "dow", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").alias("s1"),
        F.sum(F.col("xc") * F.col("xc")).alias("s2"),
    )
    d = lambda c: c.cast("decimal(20,0)")  # noqa: E731 — products stay < 1e38
    lhs = d(F.col("n")) * d(F.col("xc")) - d(F.col("s1"))
    rhs = F.lit(SEASONAL_K * SEASONAL_K) * (
        d(F.col("n")) * d(F.col("s2")) - d(F.col("s1")) * d(F.col("s1"))
    )
    flagged = ev.join(F.broadcast(prof), ["event_type", "dow", "hr"]).select(
        "event_type", "dow", "hr", "n", "s1",
        (lhs * lhs > rhs).cast("int").alias("is_anom"),
    )
    return (
        flagged.groupBy("event_type", "dow", "hr", "n", "s1")
        .agg(F.sum("is_anom").alias("na"))
        .select(
            "event_type",
            "dow",
            "hr",
            F.col("n").alias("n_events"),
            # integer half-up rounding: mean = s1/(100n) dollars at
            # 4dp is floor((200·s1 + n) / 2n) e-4 — s1/n can land
            # EXACTLY on a 4dp half-point (observed: 39209/800 =
            # 49.01125) where decimal-vs-double engine paths diverge;
            # staying in integers removes the class
            (F.expr("(200 * s1 + n) div (2 * n)") / 10000.0).alias("mean_value"),
            F.col("na").cast("bigint").alias("n_anomalies"),
            (F.expr("(20000 * na + n) div (2 * n)") / 10000.0).alias("anom_rate"),
        )
        .orderBy("event_type", "dow", "hr")
    )


SEASONAL_PROFILE_SQL = f"""
WITH ev AS (
  SELECT event_type, isodow(ts) - 1 AS dow, hour(ts) AS hr,
         CAST(round(value * 100, 0) AS BIGINT) AS xc
  FROM events
), prof AS (
  SELECT event_type, dow, hr, count(*) AS n,
         CAST(sum(xc) AS BIGINT) AS s1,
         CAST(sum(xc * xc) AS BIGINT) AS s2
  FROM ev GROUP BY event_type, dow, hr
)
SELECT p.event_type, p.dow, p.hr, p.n AS n_events,
       CAST(((200 * p.s1 + p.n) // (2 * p.n)) / 10000.0 AS DOUBLE)
         AS mean_value,
       CAST(sum(CAST(
         (CAST(p.n AS HUGEINT) * e.xc - p.s1)
           * (CAST(p.n AS HUGEINT) * e.xc - p.s1)
         > {SEASONAL_K * SEASONAL_K}
           * (CAST(p.n AS HUGEINT) * p.s2 - CAST(p.s1 AS HUGEINT) * p.s1)
         AS INT)) AS BIGINT) AS n_anomalies,
       CAST(((20000 * CAST(sum(CAST(
         (CAST(p.n AS HUGEINT) * e.xc - p.s1)
           * (CAST(p.n AS HUGEINT) * e.xc - p.s1)
         > {SEASONAL_K * SEASONAL_K}
           * (CAST(p.n AS HUGEINT) * p.s2 - CAST(p.s1 AS HUGEINT) * p.s1)
         AS INT)) AS BIGINT) + p.n) // (2 * p.n)) / 10000.0 AS DOUBLE)
         AS anom_rate
FROM ev e
JOIN prof p ON e.event_type = p.event_type AND e.dow = p.dow AND e.hr = p.hr
GROUP BY p.event_type, p.dow, p.hr, p.n, p.s1, p.s2
ORDER BY p.event_type, p.dow, p.hr
"""


QUERIES = {
    "rolling_zscore_anomalies": rolling_zscore_anomalies,
    "value_drift_psi": value_drift_psi,
    "seasonal_profile_anomalies": seasonal_profile_anomalies,
}

ORACLES = {
    "rolling_zscore_anomalies": ROLLING_ZSCORE_SQL,
    "value_drift_psi": VALUE_DRIFT_PSI_SQL,
    "seasonal_profile_anomalies": SEASONAL_PROFILE_SQL,
}
