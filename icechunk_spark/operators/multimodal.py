"""Multimodal-column plumbing (SURVEY.md §2f).

Media (image/audio/video) is carried as an opaque ``binary`` payload
column plus a typed metadata struct.  Decode / feature-extraction runs
as Arrow-batched ``mapInPandas`` — the real distributed shape for
CPU-heavy per-item work (no shuffle, batch-at-a-time, pipeline
parallel across partitions).

The container has no image/audio libraries, so the decoder is a
clearly-marked deterministic fake: features derive from the payload
bytes via md5/byte-length only.  That keeps the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — real AND
oracle-checkable (DuckDB md5 over the same bytes).  ``resize`` /
``frame_sample`` raise NotImplementedError at the decode step behind
the same plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, "
    "payload_md5 string, width int, height int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: binary payload + typed metadata.
    (Real pipelines would read payloads from object storage; the bytes
    here are the document text so every stage stays deterministic.)"""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder (md5-derived dimensions).  A real
    deployment replaces the body with PIL/ffmpeg calls; the Arrow
    batch interface and output schema stay identical."""
    for pdf in batches:
        payloads = pdf["payload"]
        md5s = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(p)) for p in payloads],
                "payload_md5": md5s,
                "width": [(ord(h[0]) % 8 + 1) * 32 for h in md5s],
                "height": [(ord(h[1]) % 8 + 1) * 32 for h in md5s],
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media payloads via mapInPandas."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(_decode_batch, FEATURE_SCHEMA).orderBy("media_id")


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST((ascii(substr(md5(text), 1, 1)) % 8 + 1) * 32 AS INT) AS width,
       CAST((ascii(substr(md5(text), 2, 1)) % 8 + 1) * 32 AS INT) AS height
FROM documents
ORDER BY media_id
"""


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 10) -> DataFrame:
    """Video frame sampling: STUB — the Arrow plumbing (explode frames
    per payload) is real; actual decode needs ffmpeg, absent here."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "frame decode requires ffmpeg/PyAV (not in this container); "
            "schema and batch plumbing are exercised via multimodal_features"
        )

    return media.mapInPandas(sample, "media_id bigint, frame_idx int, frame binary")


def resize(spark: SparkSession, sf_dir: str, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize: STUB — see frame_sample."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "image")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL (not in this container); "
            "schema and batch plumbing are exercised via multimodal_features"
        )

    return media.mapInPandas(do_resize, "media_id bigint, payload binary")


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: group binary payloads by JVM-side md5 (no
    Python in the hot path — the hash never leaves codegen), keep the
    smallest media_id per content group."""
    media = media_table(spark, sf_dir)
    return (
        media.withColumn("payload_md5", F.md5("payload"))
        .groupBy("payload_md5")
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_media_id", "payload_md5", "n_copies")
        .orderBy("keep_media_id")
    )


MEDIA_DEDUP_SQL = """
SELECT min(doc_id) AS keep_media_id, md5(text) AS payload_md5,
       count(*) AS n_copies
FROM documents
GROUP BY payload_md5
ORDER BY keep_media_id
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "media_dedup": media_dedup,
}
ORACLES = {
    "multimodal_features": MULTIMODAL_SQL,
    "media_dedup": MEDIA_DEDUP_SQL,
}
