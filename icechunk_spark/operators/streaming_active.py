"""Streaming daily active/new/returning users (SURVEY.md §2g
extension): the streaming twin of ``daily_active_users``
(activeusers.py).  The STREAM maintains the distinct (day, user)
pairs incrementally — a streaming dropDuplicates over (day, user_id)
whose state is bounded by users × days, not event volume (the census
class; a production monitor would watermark old days closed), each
pair emitted exactly once in append mode — and the
active/new/returning/cumulative algebra runs over the DRAINED pairs
with the batch op's shared implementation (census_over_day_user), so
the two registered queries cannot diverge.

Trigger cadence is protocol, not semantics — distinct-pair
maintenance is idempotent/commutative, so any file batching drains to
identical state (the stream_quantile_sketch precedent; 8
files/trigger keeps the drain off the per-micro-batch floor while
staying genuinely multi-batch at decade scale).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.operators.activeusers import DAILY_ACTIVE_SQL, census_over_day_user
from icechunk_spark.streaming.events import read_event_stream, run_to_parquet


def _day_user_stream(events: DataFrame) -> DataFrame:
    # streaming dropDuplicates in APPEND mode: each distinct (day,
    # user) pair is emitted EXACTLY ONCE across all micro-batches —
    # the first draft's complete-mode groupBy re-emitted the FULL
    # pair state every batch (state here is users x days, ~10M rows
    # at sf10, unlike the 256-bin sketch twins) and measured 36.9 s;
    # append-once is the census-state shape
    return events.select(F.to_date("ts").alias("day"), "user_id").dropDuplicates(
        ["day", "user_id"]
    )


_INTERVAL_SECS = {
    "week": 604800.0,
    "day": 86400.0,
    "hour": 3600.0,
    "minute": 60.0,
    "second": 1.0,
    "millisecond": 0.001,
    "microsecond": 0.000001,
}


def _delay_seconds(late: str) -> float:
    """Parse a Spark delay-threshold string ("1 day", "36 hours",
    "1 day 12 hours") into seconds.  Only the calendar-free units are
    accepted — the set dropDuplicatesWithinWatermark's threshold
    meaningfully uses here.  The WHOLE string must be value-unit
    pairs (review r14): findall-style scanning would let a sign or
    trailing junk ("-2 days", "1 day blahblah") slip past validation
    only to fail — or worse, pass — inside Spark."""
    import re

    if not re.fullmatch(r"\s*(?:\d+(?:\.\d+)?\s*[a-zA-Z]+\s*)+", late):
        raise ValueError(f"unparseable delay threshold: {late!r}")
    total = 0.0
    for value, unit in re.findall(r"(\d+(?:\.\d+)?)\s*([a-zA-Z]+)", late):
        unit = unit.lower().rstrip("s")
        if unit not in _INTERVAL_SECS:
            raise ValueError(f"unsupported delay unit {unit!r} in {late!r}")
        total += float(value) * _INTERVAL_SECS[unit]
    return total


def day_user_stream_watermarked(events: DataFrame, late: str = "1 day") -> DataFrame:
    """The PRODUCTION census shape (VERDICT r12 #8): watermark closed
    days so dedup state holds only the open-day window instead of
    growing with history.  ``dropDuplicatesWithinWatermark`` keeps a
    (day, user) pair's state only until the event-time watermark
    passes its day + ``late`` — users × open-days state, constant over
    an unbounded stream, where the registered twin's plain
    dropDuplicates state is users × ALL days (fine for a bounded
    replay, unbounded on a real stream).

    Semantics contract (pinned in tests/test_stream_active_watermark):
    with event-time disorder ≤ ``late`` AND ``late`` ≥ 1 day, the
    drained pairs are exactly the distinct (day, user) pairs — each
    emitted once, none dropped — so the census over them matches the
    batch oracle on every closed day.  The 1-day floor is ENFORCED
    (ADVICE r13): dedup state for a (day, user) pair expires once the
    watermark passes its first-seen event time + ``late``, so with
    late < 1 day two same-day events further apart than ``late`` would
    RE-EMIT the pair and inflate active_users even on perfectly
    ordered input — the day granularity of the key sets the floor on
    the delay."""
    if _delay_seconds(late) < 86400:
        raise ValueError(
            f"late={late!r} is below the 1-day floor: the dedup key is "
            "(day, user), so a delay shorter than one day lets a pair's "
            "state expire mid-day and re-emit on a later same-day event"
        )
    return (
        events.withWatermark("ts", late)
        .select(F.to_date("ts").alias("day"), "user_id", "ts")
        .dropDuplicatesWithinWatermark(["day", "user_id"])
        .select("day", "user_id")
    )


def stream_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet sink, not the memory test sink (r14): the drained pair
    # set is users × days VOLUME, and the memory sink's driver-local
    # LocalTableScan cost the census ~5 s serial at sf10's ~4M pairs;
    # the file sink keeps the census fully distributed
    from icechunk_spark.streaming.events import _stream_dir, scaled_state_partitions

    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    # volume-derived state partitions (r14): the dedup state store
    # pays a fixed per-partition per-batch commit cost; cap rule keeps
    # at-scale parallelism
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        pairs = run_to_parquet(spark, _day_user_stream(ev), prefix="icdaupairs")
    return census_over_day_user(pairs.select("day", "user_id"))


QUERIES = {"stream_active_users": stream_active_users}
# identical contract to the batch twin (the drained distinct pairs
# are the same set the batch DISTINCT computes)
ORACLES = {"stream_active_users": DAILY_ACTIVE_SQL}
