"""stream_interval_join over a MULTI-FILE, non-time-ordered source
must equal the batch interval join (r14 regression pin).

The pre-r14 form throttled the availableNow drain to one file per
trigger; over a directory whose part files are hash-distributed (not
time-ranged), the watermark derived from batch N's max event time ran
ahead of batch N+1's older rows and the stream-stream join silently
dropped them as late (measured at sf10: 245 of 37 100 rows survived).
The unthrottled reader processes the whole bounded replay in one
micro-batch, so no row can fall behind the watermark for ANY layout —
the same contract stream_zscore_alerts documents.

Also pins scaled_state_partitions' arithmetic: state-store instances
per stateful operator scale with the partition count, so bounded
drains derive it from stream volume (floor 2, cap = the session's
configured shuffle parallelism).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.operators.streaming_queries import stream_interval_join
from icechunk_spark.streaming.events import scaled_state_partitions

from .conftest import SF_DIR


def test_interval_join_multifile_equals_batch(spark, tmp_path):
    # stage events as 4 hash-distributed (NOT time-ordered) part files
    src = str(tmp_path / "mf")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.repartition(4).write.parquet(f"{src}/events.parquet")

    got = sorted(tuple(r) for r in stream_interval_join(spark, src).collect())

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = sorted(
        tuple(r)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id", "click_id", F.col("p_user").alias("user_id"), "purchase_value"
        )
        .collect()
    )
    assert len(want) > 0  # the fixture must actually exercise the join
    assert got == want


def test_stream_dedup_multifile_equals_batch(spark, tmp_path):
    """Duplicate ids spread across hash-distributed part files must
    still collapse to one row each (pre-r14, late-row filtering across
    non-time-ordered micro-batches dropped ~93 % of rows at sf10)."""
    from icechunk_spark.operators.streaming_queries import stream_dedup

    src = str(tmp_path / "dup")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # duplicate every event id once, then scatter over 4 files so a
    # pair's two copies usually land in different files
    dup = ev.unionByName(ev).repartition(4)
    dup.write.parquet(f"{src}/events.parquet")

    got = stream_dedup(spark, src)
    assert got.count() == ev.count()  # one survivor per event_id
    # survivor values: with both copies identical, full row equality
    want = ev.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    mism = (
        got.groupBy(got.columns).count().withColumnRenamed("count", "na")
        .join(
            want.groupBy(got.columns).count().withColumnRenamed("count", "nb"),
            got.columns,
            "full_outer",
        )
        .filter("na IS NULL OR nb IS NULL OR na <> nb")
        .count()
    )
    assert mism == 0


def test_scaled_state_partitions_floor_and_cap(spark, tmp_path):
    small = tmp_path / "small"
    small.mkdir()
    (small / "a.bin").write_bytes(b"x" * 10)
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with scaled_state_partitions(spark, str(small)) as n:
        assert n == 2  # floor: tiny stream never collapses below 2
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == 2
    # restored on exit
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == sess

    big = tmp_path / "big"
    big.mkdir()
    # one sparse-ish file big enough to exceed cap * target is overkill
    # to materialize; instead pin the arithmetic via a moderate file
    # and a temporarily lowered session parallelism
    (big / "a.bin").write_bytes(b"x" * (80 << 20))  # 80 MB -> ceil(80/32)=3
    with scaled_state_partitions(spark, str(big)) as n:
        assert n == min(sess, 3)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        with scaled_state_partitions(spark, str(big)) as n:
            assert n == 2  # cap: never above the session's parallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
