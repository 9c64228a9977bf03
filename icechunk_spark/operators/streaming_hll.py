"""Streaming mergeable HLL distinct counting (SURVEY.md §2g
extension): the streaming twin of ``hll_mergeable_distinct``
(hllmerge.py).  The STREAM maintains one Datasketches HLL sketch per
(event_type, day) — state bounded by types × days × sketch bytes
(lgConfigK=12 ⇒ ~4 KB each) no matter how many events flow — and the
per-type distinct estimate is read off the drained sketches by sketch
UNION, never a rescan of the events.

This is the dashboard shape at 100 TB: the stream keeps per-partition
sketches current; "distinct users over any day range" is a union over
the range's sketches.  Trigger cadence is protocol, not semantics —
hll_sketch_agg's merge is commutative/associative, so any file
batching drains to identical sketch state (the stream_quantile_sketch
precedent; 8 files/trigger keeps the drain off the per-micro-batch
floor while staying genuinely multi-batch at decade scale).

Oracle contract (sketch bytes are engine artifacts — the hllmerge
precedent): the per-type EXACT distinct count, computed independently
by both engines, is the value-checked column; the drained-sketch
union estimate must land within HLL_TOL_PCT of it.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.hllmerge import HLL_MERGEABLE_SQL, HLL_TOL_PCT
from icechunk_spark.streaming.events import read_event_stream, run_to_memory


def _daily_hll_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )


def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"shll_{uuid.uuid4().hex[:8]}"
    from icechunk_spark.streaming.events import _stream_dir, scaled_state_partitions

    ev = read_event_stream(spark, sf_dir, max_files_per_trigger=8)
    # volume-derived state partitions (r14): the per-partition state
    # store pays a fixed per-batch commit cost; same cap rule as the
    # other stateful drains so at-scale parallelism is untouched
    with scaled_state_partitions(spark, _stream_dir(sf_dir)):
        run_to_memory(_daily_hll_stream(ev), name, output_mode="complete")
    merged = (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    # exact side: the same bounded batch table the oracle reads — the
    # value-checked anchor for the estimate invariant
    exact = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            F.col("n_days").cast("bigint").alias("n_days"),
            (
                F.abs(F.col("est") - F.col("exact_distinct")) * 100
                <= F.col("exact_distinct") * HLL_TOL_PCT
            ).alias("estimate_within_tol"),
        )
        .orderBy("event_type")
    )


QUERIES = {"stream_hll_distinct": stream_hll_distinct}
# identical contract to the batch twin: exact counts value-checked,
# estimate gated by the tolerance boolean
ORACLES = {"stream_hll_distinct": HLL_MERGEABLE_SQL}
