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
oracle-checkable (DuckDB md5 over the same bytes).  ``resize`` and
``frame_sample`` operate on declared RAW byte layouts, so the
resampling/slicing math is real and value-verified cross-engine; a
PIL/ffmpeg deployment swaps only the frombuffer decode.
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


# Synthetic RAW codecs: the container ships no media libraries, so the
# payloads are declared RAW byte layouts and the decode step is a
# numpy frombuffer — but everything downstream (frame slicing,
# nearest-neighbor resampling, Arrow batching) is the REAL math a
# PIL/ffmpeg deployment would run after its decode.  Swap the
# frombuffer for the codec call and nothing else changes.
FRAME_BYTES = 32  # video: stream of 32-byte RAW8 frames
FRAME_EVERY_N = 2  # sample every 2nd frame
IMG_W = 16  # image: RAW8, 16 px wide, len//16 rows
RESIZE_TO = 8  # resize target (8x8 RAW8)


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = FRAME_EVERY_N) -> DataFrame:
    """Video frame sampling: treat the payload as a stream of
    FRAME_BYTES-sized RAW8 frames, keep every ``every_n``-th, and emit
    (frame_idx, md5, bytes) per kept frame — the decode-free half of
    an ffmpeg pipeline, Arrow-batched with one output row per frame."""
    import hashlib as _hashlib

    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, sizes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for k in range(0, len(raw) // FRAME_BYTES, every_n):
                    frame = raw[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(k)
                    md5s.append(_hashlib.md5(frame).hexdigest())
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_md5": md5s, "n_bytes": sizes}
            )

    return media.mapInPandas(
        sample, "media_id bigint, frame_idx int, frame_md5 string, n_bytes bigint"
    ).orderBy("media_id", "frame_idx")


FRAME_SAMPLE_SQL = f"""
WITH v AS (
  SELECT doc_id AS media_id, text
  FROM documents WHERE doc_id % 3 = 2  -- media_type = video
), frames AS (
  SELECT media_id,
         CAST(k AS INT) AS frame_idx,
         md5(substr(text, k * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
  FROM v, (SELECT unnest(range(0, 100000, {FRAME_EVERY_N})) AS k) ks
  WHERE k < length(text) // {FRAME_BYTES}
)
SELECT media_id, frame_idx, frame_md5, CAST({FRAME_BYTES} AS BIGINT) AS n_bytes
FROM frames ORDER BY media_id, frame_idx
"""


def resize(spark: SparkSession, sf_dir: str, out: int = RESIZE_TO) -> DataFrame:
    """Image resize: decode the payload as a RAW8 image (IMG_W px
    wide), nearest-neighbor resample to ``out`` x ``out``, and emit
    the resized payload's md5 + mean pixel — the real resampling math
    (index gather), verified value-for-value by the oracle."""
    import hashlib as _hashlib

    import numpy as np

    media = media_table(spark, sf_dir).filter(F.col("media_type") == "image")

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, md5s, means = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = len(raw) // IMG_W
                img = raw[: h * IMG_W].reshape(h, IMG_W)
                rr = (np.arange(out) * h) // out
                cc = (np.arange(out) * IMG_W) // out
                small = img[np.ix_(rr, cc)]
                buf = small.tobytes()
                ids.append(mid)
                md5s.append(_hashlib.md5(buf).hexdigest())
                # exact integer sum, not a rounded mean: n/64 lands
                # exactly on round-half boundaries where engines'
                # rounding modes differ
                means.append(int(small.sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "out_w": [out] * len(ids),
                    "out_h": [out] * len(ids),
                    "resized_md5": md5s,
                    "sum_pixels": means,
                }
            )

    return media.mapInPandas(
        do_resize,
        "media_id bigint, out_w int, out_h int, resized_md5 string, sum_pixels bigint",
    ).orderBy("media_id")


RESIZE_SQL = f"""
WITH img AS (
  SELECT doc_id AS media_id, text, length(text) // {IMG_W} AS h
  FROM documents WHERE doc_id % 3 = 0  -- media_type = image
), px AS (
  SELECT media_id,
         [substr(text,
                 ((i // {RESIZE_TO}) * h // {RESIZE_TO}) * {IMG_W}
                 + ((i % {RESIZE_TO}) * {IMG_W} // {RESIZE_TO}) + 1, 1)
          FOR i IN range(0, {RESIZE_TO} * {RESIZE_TO})] AS pix
  FROM img
)
SELECT media_id,
       {RESIZE_TO} AS out_w, {RESIZE_TO} AS out_h,
       md5(array_to_string(pix, '')) AS resized_md5,
       CAST(list_sum(list_transform(pix, c -> ascii(c))) AS BIGINT) AS sum_pixels
FROM px ORDER BY media_id
"""


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
    "frame_sample": frame_sample,
    "media_resize": resize,
}
ORACLES = {
    "multimodal_features": MULTIMODAL_SQL,
    "media_dedup": MEDIA_DEDUP_SQL,
    "frame_sample": FRAME_SAMPLE_SQL,
    "media_resize": RESIZE_SQL,
}
