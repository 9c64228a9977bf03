"""Streaming mergeable quantile sketch (SURVEY.md §2g extension):
the streaming twin of ``quantile_sketch_mergeable`` (quantile_merge
.py).  The STREAM maintains the per-(day, bin) histogram
incrementally — state bounded by days x B bins no matter how many
events flow — and p50/p90/p99 are read off the drained sketch with
the same pure-integer lower-edge algebra as the batch op.

One deliberate difference from the batch twin: the bin DOMAIN is
declared up front (lo=0, cap=$2,000 in integer cents, values clamped
into range) instead of derived from a data min/max pass — a stream
cannot scan its own future, and a production monitor configures its
histogram domain.  The clamp makes tail estimates saturate at the cap
rather than silently growing state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.operators.quantile_merge import quantiles_over_sketch
from icechunk_spark.streaming.events import read_event_stream, run_to_memory

SQ_BINS = 256
SQ_LO = 0  # cents
SQ_CAP = 200_000  # cents ($2,000) — values clamp into [SQ_LO, SQ_CAP]
SQ_WIDTH = (SQ_CAP - SQ_LO) // SQ_BINS + 1
SQ_PCTS = (50, 90, 99)


def _daily_sketch_stream(events: DataFrame) -> DataFrame:
    # integer div end to end (the module's determinism contract):
    # double-divide + truncate would round across a bucket boundary
    # for domains near 2^53 and diverge from the oracle's //
    bin_expr = (
        f"(GREATEST(LEAST(CAST(round(value * 100) AS BIGINT), {SQ_CAP}), {SQ_LO})"
        f" - {SQ_LO}) div {SQ_WIDTH}"
    )
    return events.groupBy(
        F.to_date("ts").alias("day"),
        F.expr(bin_expr).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"squant_{uuid.uuid4().hex[:8]}"
    # Trigger cadence is PROTOCOL here, not semantics: the (day, bin)
    # count aggregation is commutative, so any file batching drains to
    # the identical sketch state (pinned by the accumulation-equality
    # test, which replays per-file).  The r11 sf10 drain profile
    # (VERDICT r11 #5) measured the 1-file cadence at 27.4 s — a
    # ~0.85 s per-micro-batch floor (planning + state store + the
    # complete-mode full re-emission) x 32 files — vs 4.8 s at 8
    # files/trigger and 1.5 s unthrottled.  8 keeps a genuine
    # multi-batch accumulation at decade scale (4 batches at sf10)
    # without paying the floor 32 times; a production monitor sizes
    # its trigger to arrival rate, not to one file.
    from icechunk_spark.streaming.events import _stream_dir, scaled_state_partitions

    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    # volume-derived state partitions (r14, same rationale as the
    # other stateful drains)
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(_daily_sketch_stream(ev), name, output_mode="complete")
    # the pick algebra is SHARED with the batch op (quantile_merge.py)
    # so the two registered queries cannot diverge
    return quantiles_over_sketch(spark.table(name), SQ_LO, SQ_WIDTH, SQ_PCTS)


STREAM_QUANTILE_SQL = f"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS day,
         GREATEST(LEAST(CAST(round(value * 100) AS BIGINT), {SQ_CAP}), {SQ_LO}) AS c
  FROM events
), daily AS (
  SELECT day, (c - {SQ_LO}) // {SQ_WIDTH} AS bin, count(*) AS cnt
  FROM c GROUP BY 1, 2
), merged AS (
  SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY 1
), stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         (SELECT count(DISTINCT day) FROM daily) AS n_days
  FROM merged
), cum AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM merged
), q AS (
  SELECT pct FROM (VALUES (50), (90), (99)) t(pct)
)
SELECT pct,
       CAST((SELECT min(bin) FROM cum, stats WHERE cum >= (pct * n + 99) // 100)
              * {SQ_WIDTH} + {SQ_LO} AS DOUBLE) / 100.0 AS est_value,
       stats.n AS n, stats.n_days AS n_days
FROM q, stats
ORDER BY pct
"""

QUERIES = {"stream_quantile_sketch": stream_quantile_sketch}
ORACLES = {"stream_quantile_sketch": STREAM_QUANTILE_SQL}
