"""Registered watermarked census (streaming_active_wm.py; VERDICT r13
#3): the promoted production form must (1) replay genuinely
multi-batch with the watermark advancing between batches, (2) match
the batch daily_active_users census row-for-row, and (3) enforce the
1-day delay floor (ADVICE r13) that makes the exactness contract
true.
"""

from __future__ import annotations

import glob
import os

import pytest

from icechunk_spark.operators.activeusers import daily_active_users
from icechunk_spark.operators.streaming_active import (
    _delay_seconds,
    day_user_stream_watermarked,
)
from icechunk_spark.operators.streaming_active_wm import (
    stage_time_ordered_events,
    stream_active_users_watermarked,
)

from .conftest import SF_DIR


def test_staging_is_time_ordered_and_multibatch(spark):
    root = stage_time_ordered_events(spark, SF_DIR)
    files = sorted(glob.glob(os.path.join(root, "events.parquet", "*.parquet")))
    assert len(files) >= 3, "need a multi-batch replay for the watermark to advance"
    # mtimes ascend with the name order the ranges were written in
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # ts ranges are non-overlapping and ascending file-to-file: each
    # file's max ts <= the next file's min ts (range partitioning)
    prev_max = None
    for f in files:
        df = spark.read.parquet(f)
        row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
        if prev_max is not None:
            assert prev_max <= row["lo"]
        prev_max = row["hi"]


def test_registered_watermarked_census_matches_batch(spark):
    got = [tuple(r) for r in stream_active_users_watermarked(spark, SF_DIR).collect()]
    want = [tuple(r) for r in daily_active_users(spark, SF_DIR).collect()]
    assert got == want and len(got) > 0


def test_late_floor_enforced(spark):
    ev = spark.range(1).selectExpr(
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS ts", "id AS user_id"
    )
    for bad in ("2 hours", "30 minutes", "0.5 days", "23 hours 59 minutes"):
        with pytest.raises(ValueError, match="1-day floor"):
            day_user_stream_watermarked(ev, late=bad)
    # at or above the floor: accepted (plan construction only)
    for ok in ("1 day", "36 hours", "2 days", "1 day 12 hours", "1 week"):
        day_user_stream_watermarked(ev, late=ok)


def test_delay_parser():
    assert _delay_seconds("1 day") == 86400
    assert _delay_seconds("36 hours") == 129600
    assert _delay_seconds("1 day 12 hours") == 129600
    assert _delay_seconds("1 week") == 604800
    assert _delay_seconds("500 milliseconds") == 0.5
    with pytest.raises(ValueError):
        _delay_seconds("fortnight")
    with pytest.raises(ValueError):
        _delay_seconds("3 parsecs")
    # review r14: signs and trailing junk must not slip past the
    # fullmatch validation
    for bad in ("-2 days", "1 day blahblah", "2 days -1 hour", "", "  "):
        with pytest.raises(ValueError):
            _delay_seconds(bad)


def test_run_to_parquet_zero_row_drain(spark, tmp_path):
    """A bounded drain that emits NOTHING (all events filtered) must
    return an empty frame with the declared schema, not fail parquet
    schema inference on a fileless sink directory."""
    import pyspark.sql.functions as F

    from icechunk_spark.streaming.events import read_event_stream, run_to_parquet

    ev = read_event_stream(spark, SF_DIR, max_files_per_trigger=None)
    none = ev.select(F.to_date("ts").alias("day"), "user_id").filter(F.lit(False))
    out = run_to_parquet(spark, none, prefix="icempty")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["day", "user_id"]
