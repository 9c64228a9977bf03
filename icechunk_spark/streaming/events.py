"""Structured Streaming pipelines over the events stream (SURVEY.md
§2g): watermarked tumbling-window aggregation, session windows,
streaming dedup, and transactional append into the versioned repo via
``foreachBatch`` (exactly-once per micro-batch: each batch becomes one
commit, batch id recorded in the commit metadata for idempotent
restart).

All pipelines use the file source with ``availableNow`` in tests (the
bounded replay of the same files the batch oracle reads), and would
run unchanged against a Kafka/file stream in production — watermarks
bound the state store size regardless of stream length.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.functions import money_sum

#: Stream bytes per state-store partition for stateful drains.  Every
#: stateful operator instantiates one state store PER SHUFFLE PARTITION
#: per operator instance (a stream-stream join holds FOUR per
#: partition), and each store pays a fixed load+commit cost per
#: micro-batch that is independent of the rows it holds (measured r14:
#: the sf0.1 interval-join drain is ~linear in the partition count —
#: 48.5 / 10.7 / 4.1 s at 32 / 8 / 2 partitions under equal load,
#: while at sf10 volume 8 vs 32 partitions is a tie, 10.7 vs 11.4 s).
#: Deriving the state partition count from the stream's input bytes —
#: floored at 2 (stay distributed), capped at the session's configured
#: shuffle parallelism (the knob a production deployment sizes for its
#: cluster; at 100 TB the cap is what rules) — removes the fixed floor
#: at small volume without touching the scale shape.  Env-overridable
#: like every scale-dependent setting in this repo.
STREAM_STATE_TARGET_BYTES = int(
    os.environ.get("ICS_STREAM_STATE_TARGET_BYTES", str(32 << 20))
)


def _dir_file_bytes(d: str) -> int:
    """Total bytes of the files under a (possibly remote) stream dir."""
    from pyarrow import fs as pafs

    from icechunk_spark.repo.fsio import _fs_path

    fs, p = _fs_path(d)
    infos = fs.get_file_info(pafs.FileSelector(p, recursive=True))
    return sum(i.size or 0 for i in infos if i.type == pafs.FileType.File)


@contextlib.contextmanager
def scaled_state_partitions(spark: SparkSession, stream_dir: str):
    """Scope ``spark.sql.shuffle.partitions`` — which fixes a NEW
    streaming query's state partition count at start — to a
    volume-derived value while a bounded drain starts.  The session
    value is restored afterwards, so batch plans built outside the
    drain are untouched.  The conf is only read at query START; the
    partition count is then pinned in the query's checkpoint, so the
    scope need only cover ``.start()``."""
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = max(2, min(sess, -(-_dir_file_bytes(stream_dir) // STREAM_STATE_TARGET_BYTES)))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stream_dir(sf_dir: str) -> str:
    """The file stream source requires a DIRECTORY.  A parquet
    directory (the normal Spark write layout) streams in place — any
    URI scheme, nothing staged.  A bare single-file source is staged
    once into a deterministic local temp dir via a real pyarrow copy,
    which works where ``os.symlink`` does not (object-store roots)."""
    from pyarrow import fs as pafs

    from icechunk_spark.repo.fsio import _fs_path

    src = f"{sf_dir.rstrip('/')}/events.parquet"
    fs, p = _fs_path(src)
    if fs.get_file_info(p).type == pafs.FileType.Directory:
        return src
    key = hashlib.md5(src.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"icstream_{key}")
    os.makedirs(d, exist_ok=True)
    staged = os.path.join(d, "events.parquet")
    if not os.path.exists(staged):
        import uuid

        tmp = f"{staged}.tmp.{uuid.uuid4().hex}"  # unique per stager
        with fs.open_input_file(p) as rf, open(tmp, "wb") as wf:
            while True:
                buf = rf.read(8 << 20)
                if not buf:
                    break
                wf.write(buf)
        os.replace(tmp, staged)  # atomic: concurrent stagers converge
    return d


def read_event_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = _stream_dir(sf_dir)
    # The file source needs a declared schema: sniff it from the parquet
    # footers with a driver-side batch read (metadata only, no job), the
    # same way the batch path (catalog.load_tables) discovers the ts
    # type.  Testdata stores ts as parquet timestamp[us] (reads as a
    # timestamp directly); legacy TIMESTAMP(NANOS) files surface as
    # bigint nanoseconds under nanosAsLong and need the manual convert.
    # ``max_files_per_trigger=None`` removes the throttle: an
    # availableNow drain then processes every available file in ONE
    # micro-batch — required by order-sensitive stateful ops whose
    # in-batch sort must see the whole bounded replay (files in a
    # multi-file directory arrive in mod-time order, which need not be
    # event-time order).
    reader = spark.readStream.schema(spark.read.parquet(d).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(d)
    # Watermarks require TIMESTAMP (with local tz): normalize whatever
    # the footer gave (timestamp_ntz for timestamp[us] parquet, bigint
    # nanos for legacy NANOS) to LTZ.  Session tz is pinned to UTC so
    # the NTZ↔LTZ casts are exact; query wrappers cast outputs back to
    # TIMESTAMP_NTZ to match the naive DuckDB oracle.
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_agg_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 2-hour watermark for late data."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of the
    batch ``sessionize`` operator."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), money_sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Drop duplicate event ids within the watermark horizon."""
    return events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(["event_id"])


def purchase_click_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding hour.  Watermarks on both sides +
    the event-time range predicate let Spark expire join state — the
    canonical bounded-state stream-stream join."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"), "purchase_value")


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running event count and value total, one updated row per user per
    micro-batch.  State is a (count, total) pair per user — O(users)
    state-store size, no watermark needed (NoTimeout keeps totals for
    the stream's lifetime, which is the semantics of a running total).

    This is the escape hatch for aggregations Spark's built-in
    windowed operators can't express; the batch equivalence (drained
    stream == plain groupBy) is the oracle contract."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # total accumulated (and emitted) in integer micro-units so the
    # running sum is exact and order-independent (matches a
    # DECIMAL(18,6) oracle sum); consumers divide/round exactly
    out_schema = "user_id bigint, n_events bigint, total_micros bigint"
    state_schema = "n bigint, total_micros bigint"

    def update(key, pdfs, state: GroupState):
        n, total_micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_micros += int((pdf["value"] * 1_000_000).round().sum())
        state.update((int(n), int(total_micros)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_micros": [total_micros],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def zscore_alerts_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming twin of the batch rolling_zscore_anomalies
    (operators/anomaly_ext.py): per-user trailing-10 z-score alert
    census maintained by ``applyInPandasWithState``.  State per user =
    the last Z_WINDOW cents values (a bounded deque — O(users·10)
    state-store size) plus the running census; each micro-batch's rows
    are sorted by (ts, event_id) before folding, so with time-ordered
    file arrival the drained result equals the batch operator exactly.

    Determinism mirrors the batch op expression-for-expression:
    integer-cents frame sums (exact), IEEE double mean/var/z (numpy —
    Python's ``float/0.0`` raises where Spark's double division yields
    ±Inf), non-finite z skipped exactly as Spark's
    ``cast(decimal(24,12))`` nulls ±Inf/NaN out, and HALF_UP rounding
    replicated with ``decimal.Decimal`` quantization (12 digits, then
    6 — the cast-then-round pair)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from icechunk_spark.operators.anomaly_ext import Z_MIN_N, Z_THRESHOLD, Z_WINDOW

    out_schema = (
        "user_id bigint, n_scored bigint, n_anomalies bigint, max_abs_z double"
    )
    state_schema = (
        "hist array<bigint>, n_scored bigint, n_anomalies bigint, max_abs_z double"
    )

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        if state.exists:
            hist, n_scored, n_anom, max_z = state.get
            hist = list(hist)
        else:
            hist, n_scored, n_anom, max_z = [], 0, 0, None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        q12, q6 = Decimal("1e-12"), Decimal("1e-6")
        one = Decimal(1)
        # HALF_UP like the batch op's F.round(value*100, 0) — pandas
        # .round() is half-to-even and diverges on exact .5 cents (the
        # cross-engine rounding class this repo standardizes on
        # Decimal quantization for)
        cents_list = [
            int(Decimal(float(v) * 100).quantize(one, ROUND_HALF_UP))
            for v in batch["value"]
        ]
        # vectorized trailing-frame sums: prefix sums over hist+batch
        # replace the O(W) per-row fold (9.6 s → see PLANS r9 note)
        h = len(hist)
        seq = np.asarray(hist + cents_list, dtype=np.int64)
        c1 = np.concatenate([[0], np.cumsum(seq)])
        c2 = np.concatenate([[0], np.cumsum(seq * seq)])
        pos = np.arange(h, h + len(cents_list))  # current-row position
        lo = np.maximum(pos - Z_WINDOW, 0)
        fn = pos - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            s1 = (c1[pos] - c1[lo]).astype(np.float64)
            s2 = (c2[pos] - c2[lo]).astype(np.float64)
            fnf = fn.astype(np.float64)
            mean = s1 / fnf
            var = np.maximum((s2 - fnf * mean * mean) / (fnf - 1), 0.0)
            z_raw = (seq[pos].astype(np.float64) - mean) / np.sqrt(var)
        scoreable = (fn >= Z_MIN_N) & np.isfinite(z_raw)
        for zr in z_raw[scoreable]:
            z = float(
                Decimal(float(zr))
                .quantize(q12, ROUND_HALF_UP)
                .quantize(q6, ROUND_HALF_UP)
            )
            n_scored += 1
            if abs(z) > Z_THRESHOLD:
                n_anom += 1
            max_z = abs(z) if max_z is None else max(max_z, abs(z))
        hist = (hist + cents_list)[-Z_WINDOW:]
        state.update((hist, int(n_scored), int(n_anom), max_z))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_scored": [n_scored],
                "n_anomalies": [n_anom],
                "max_abs_z": [max_z],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain a bounded stream into an in-memory table (availableNow).

    The memory sink parks every row ON THE DRIVER and downstream
    reads are a serial LocalTableScan — right for the small drained
    states (sketches, per-window aggregates, top-k frames) most
    streaming queries emit, wrong for VOLUME outputs: use
    :func:`run_to_parquet` when the drained rows scale with data
    (the census twins' users × days pair sets — ~5 s of serial scan
    per 4M pairs at sf10, measured r14)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


#: per-call parquet-sink outputs created by THIS process; reaped at
#: exit (the bucketing._OWNED_LOCATIONS precedent — the returned
#: DataFrame reads the files lazily, so they cannot be removed inline,
#: and repeated oracle-gate runs would otherwise accumulate a pair set
#: + checkpoint per call)
_PARQUET_SINK_DIRS: set[str] = set()


def _reap_parquet_sinks() -> None:
    import shutil

    for d in _PARQUET_SINK_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _register_sink_reaper() -> None:
    import atexit

    if not getattr(_register_sink_reaper, "_done", False):
        atexit.register(_reap_parquet_sinks)
        _register_sink_reaper._done = True  # type: ignore[attr-defined]


def run_to_parquet(spark: SparkSession, df: DataFrame, prefix: str = "icsink") -> DataFrame:
    """Drain a bounded append-mode stream into a PARQUET file sink and
    return a distributed reader over the result — executors write the
    batches and everything downstream stays parallel, where the memory
    sink would serialize the whole output through the driver.  This is
    also the production shape: deduped/derived rows land in a table
    and later stages read the table.

    The declared schema is passed to the read so a zero-row drain
    (no files, only the sink's _spark_metadata log) still returns an
    empty frame of the right shape instead of failing inference."""
    import uuid

    _register_sink_reaper()
    out = tempfile.mkdtemp(prefix=f"{prefix}_{uuid.uuid4().hex[:8]}_")
    _PARQUET_SINK_DIRS.add(out)
    q = (
        df.writeStream.format("parquet")
        .option("path", os.path.join(out, "data"))
        .option("checkpointLocation", os.path.join(out, "_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(df.schema).parquet(os.path.join(out, "data"))


def run_to_parquet_complete(
    spark: SparkSession, df: DataFrame, prefix: str = "iccomplete"
) -> DataFrame:
    """Drain a bounded COMPLETE-mode stream into parquet without the
    rows ever visiting the driver: complete mode re-emits the FULL
    result every micro-batch, so a ``foreachBatch`` that overwrites
    the sink dir with each batch's (distributed) DataFrame leaves the
    final batch's full result on disk — semantically the same table
    the memory sink would hold, but written by executors and read back
    distributed.  For volume outputs this is the only scale-correct
    complete-mode drain (r14: stream_sessionize emits 9.5 M sessions
    at sf10; the memory sink parked them all on the driver and a
    second drain in the same session lost tasks to driver-memory
    pressure).  Zero-batch drains (empty source) leave no files; the
    schema-pinned read still returns an empty frame of the right
    shape."""
    import uuid

    _register_sink_reaper()
    out = tempfile.mkdtemp(prefix=f"{prefix}_{uuid.uuid4().hex[:8]}_")
    _PARQUET_SINK_DIRS.add(out)
    data = os.path.join(out, "data")
    os.makedirs(data)

    def write_batch(bdf: DataFrame, _bid: int) -> None:
        bdf.write.mode("overwrite").parquet(data)

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(out, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(df.schema).parquet(data)


def stream_append_to_repo(
    spark: SparkSession, events: DataFrame, repo, array_path: str, checkpoint_dir: str
) -> None:
    """Append each micro-batch of per-user event counts into the
    versioned repo: one transactional commit per batch, batch id in
    the commit metadata so a replayed batch is detectable (the
    foreachBatch exactly-once pattern)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        already = any(
            s.metadata.get("stream_batch_id") == batch_id
            for s in repo.ancestry(branch="main")
            if s.metadata
        )
        if already:
            return
        counts = batch_df.groupBy("user_id").agg(F.count(F.lit(1)).cast("double").alias("delta"))
        with repo.transaction(
            message=f"stream batch {batch_id}", metadata={"stream_batch_id": batch_id}
        ) as s:
            # merge DISTRIBUTED: full-outer join of the live array with
            # this batch's deltas — no .collect(), the running state
            # never materializes on the driver
            live = s.read_array_df(array_path).select("i0", F.col("value").alias("old"))
            merged = (
                counts.select(F.col("user_id").cast("long").alias("i0"), "delta")
                .join(live, "i0", "full_outer")
                .select(
                    "i0",
                    (
                        F.coalesce(F.col("old"), F.lit(0.0))
                        + F.coalesce(F.col("delta"), F.lit(0.0))
                    ).alias("value"),
                )
            )
            if merged.limit(1).count() > 0:
                s.write_array_df(array_path, merged)

    q = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
