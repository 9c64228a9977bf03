"""Registered watermarked streaming census (SURVEY.md §2g; VERDICT
r13 #3): the PRODUCTION shape of ``stream_active_users``, promoted
from the test-only ``day_user_stream_watermarked`` helper to a
registered, oracle-checked query.

The registered twin (streaming_active.py) keeps users × ALL-days
dedup state — fine for a bounded replay, unbounded on a real stream.
This form watermarks closed days (``dropDuplicatesWithinWatermark``,
1-day delay) so state holds only the open-day window: users ×
open-days, constant over an unbounded stream.  Same census algebra,
same oracle — the two registered rows share census_over_day_user and
DAILY_ACTIVE_SQL, so they cannot diverge from each other or the batch
op.

Replay protocol (what a production deployment gets for free): the
watermark contract requires event-time disorder ≤ the delay, which a
Kafka/file stream delivers by construction (events arrive roughly in
order).  The bounded parquet replay recreates it by staging events
into a handful of TIME-ORDERED chunk files (one repartitionByRange
shuffle pass, ascending mtimes) drained one file per trigger — the
same staging the state-growth property test uses
(tests/test_stream_active_watermark.py), at a fixed chunk count so
the micro-batch drain cost stays flat across SFs instead of growing
with history length (weekly chunks would mean ~100 batches at sf10).

Scale (100 TB): state is bounded by the DOMAIN of the open window
(distinct users active in the trailing day+delay), not stream volume
or history length — the property MEASURED in
test_stream_active_watermark (doubled history ⇒ twin state ×2,
watermarked state flat).  With state bounded, the RocksDB provider
switch recorded in BASELINE.md becomes optional rather than load-
bearing.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.activeusers import DAILY_ACTIVE_SQL, census_over_day_user
from icechunk_spark.operators.streaming_active import day_user_stream_watermarked
from icechunk_spark.streaming.events import read_event_stream, run_to_memory

N_CHUNKS = 8  # fixed replay-batch count: flat drain cost at any SF


def stage_time_ordered_events(spark: SparkSession, sf_dir: str, n_chunks: int = N_CHUNKS) -> str:
    """Stage the events table as ``n_chunks`` time-ordered parquet
    files with ascending mtimes, so the file stream replays them
    oldest-first one per trigger and the watermark genuinely advances
    between micro-batches.

    ``repartitionByRange(n, "ts")`` gives non-overlapping ascending ts
    ranges in part-file-name order (partition 0 = lowest range), so a
    name-sorted rename + utime pass yields the mtime order the file
    source batches by.  NULL-ts events are excluded here — a NULL day
    is not a day (the shared census algebra and the oracle both drop
    it), and a NULL cannot be ordered against the watermark.
    """
    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("ts", "user_id")
        .filter(F.col("ts").isNotNull())
    )
    root = tempfile.mkdtemp(prefix=f"icwm_{uuid.uuid4().hex[:8]}_")
    staged = os.path.join(root, "_staged")
    ev.repartitionByRange(n_chunks, "ts").write.parquet(staged)
    stream_dir = os.path.join(root, "events.parquet")
    os.makedirs(stream_dir)
    # empty range partitions write no file; the survivors keep order
    for i, src in enumerate(sorted(glob.glob(os.path.join(staged, "part-*.parquet")))):
        dst = os.path.join(stream_dir, f"{i:04d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    shutil.rmtree(staged)
    return root


def stream_active_users_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = stage_time_ordered_events(spark, sf_dir)
    name = f"sdauwm_{uuid.uuid4().hex[:8]}"
    ev = read_event_stream(spark, root, max_files_per_trigger=1)
    run_to_memory(day_user_stream_watermarked(ev), name, output_mode="append")
    return census_over_day_user(spark.table(name).select("day", "user_id"))


QUERIES = {"stream_active_users_watermarked": stream_active_users_watermarked}
# identical contract to the batch twin and the unwatermarked stream:
# with replay disorder <= the 1-day delay, the drained pairs are
# exactly the distinct (day, user) pairs
ORACLES = {"stream_active_users_watermarked": DAILY_ACTIVE_SQL}
