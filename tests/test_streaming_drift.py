"""stream_psi_drift: the histogram must accumulate ACROSS
micro-batches — three time-ordered files at maxFilesPerTrigger=1, and
the drained day-over-day PSI must equal the single-batch result."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from icechunk_spark.operators.streaming_drift import (
    _daily_bin_counts_stream,
    psi_over_counts,
    stream_psi_drift,
)
from icechunk_spark.streaming.events import run_to_memory

from .conftest import SF_DIR


def test_psi_accumulates_across_micro_batches(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = src.count()
    ordered = src.orderBy("ts", "event_id").withColumn(
        "__rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    d = tmp_path / "ev_split_psi"
    for i in range(3):
        (
            ordered.filter(
                (F.col("__rn") > i * n / 3) & (F.col("__rn") <= (i + 1) * n / 3)
            )
            .drop("__rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(d))
        )
    raw = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    name = f"psid_t_{uuid.uuid4().hex[:8]}"
    run_to_memory(_daily_bin_counts_stream(raw), name, output_mode="complete")
    multi = [tuple(r) for r in psi_over_counts(spark, name).collect()]
    single = [tuple(r) for r in stream_psi_drift(spark, SF_DIR).collect()]
    assert multi == single
    assert multi, "no drift rows scored"
    # PSI is non-negative by construction
    assert all(r[2] >= 0 for r in multi)
