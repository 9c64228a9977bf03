"""Perceptual media near-duplicate detection (SURVEY.md §2f
extension; VERDICT r8 #8 — media_dedup is exact-md5 only, this adds
the near-dup path a real multimodal curation pipeline runs next).

Blockhash over the deterministic RAW8 decode: each image payload is
decoded (numpy ``frombuffer`` standing in for PIL — the swap point),
nearest-neighbor-resampled to 8×8 with the SAME index-gather math as
``multimodal.resize``, and thresholded against the image mean to a
64-bit perceptual hash held as four 16-bit band integers.  Banded
exactly like simhash (operators/dedup.py): candidate pairs must agree
EXACTLY on ≥1 of the 4 bands — a bucket join, never an all-pairs scan
— and only candidates pay the full hamming verify.

Scale shape at 100 TB:
- exact-dup collapse FIRST (min-id representative per payload md5) —
  a mega-cluster of identical payloads would otherwise put d² pairs
  in every band bucket; after the collapse each payload appears once.
- signatures are one Arrow-batched mapInPandas pass (the decode
  stage); everything after — banding posexplode, bucket self-join,
  hamming — is JVM expressions (bitwiseXOR + bit_count in codegen).
- candidate cardinality is O(reps × bands) bucket rows; the self-join
  shuffles 3 small ints per row.  Sub-quadratic is asserted in
  tests/test_medianear.py.

The hash is four 16-bit ints (not one int64): bit 63 of a single
BIGINT flips the sign, and signed-overflow semantics differ enough
across engines to be a correctness trap; per-band ints are always in
[0, 65535] and hamming is the sum of per-band bit_count(xor).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.operators.multimodal import IMG_W, media_table

PHASH_SIDE = 8  # blockhash grid (8×8 = 64 bits)
N_BANDS = 4  # 16 bits per band
HAM_MAX = 16  # pairs with ≤ this many differing bits are near-dups
MIN_BYTES = IMG_W * PHASH_SIDE  # need ≥8 RAW8 rows to sample


def _sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Blockhash signature per payload: 8×8 nearest-neighbor gather
    (identical indices to multimodal.resize), mean-threshold bits
    (``64·pix > Σpix`` keeps the comparison integer-exact), packed
    into 4 little-endian 16-bit bands."""
    import numpy as np

    for pdf in batches:
        ids, bands = [], [[] for _ in range(N_BANDS)]
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
            h = len(raw) // IMG_W
            img = raw[: h * IMG_W].reshape(h, IMG_W)
            rr = (np.arange(PHASH_SIDE) * h) // PHASH_SIDE
            cc = (np.arange(PHASH_SIDE) * IMG_W) // PHASH_SIDE
            pix = img[np.ix_(rr, cc)].astype(np.int64).flatten()  # row-major
            s = int(pix.sum())
            bits = (PHASH_SIDE * PHASH_SIDE * pix > s).astype(np.int64)
            ids.append(mid)
            for k in range(N_BANDS):
                chunk = bits[16 * k : 16 * (k + 1)]
                bands[k].append(int((chunk << np.arange(16)).sum()))
        out = {"media_id": ids}
        for k in range(N_BANDS):
            out[f"b{k}"] = bands[k]
        yield pd.DataFrame(out)


def media_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-representative blockhash bands over image media.  Exact
    duplicates collapse to their min-id representative FIRST (see
    module docstring — the bucket-size bound at scale)."""
    media = media_table(spark, sf_dir).filter(
        (F.col("media_type") == "image") & (F.length("payload") >= MIN_BYTES)
    )
    reps = media.withColumn("pmd5", F.md5("payload")).withColumn(
        "keep", F.min("media_id").over(Window.partitionBy("pmd5"))
    )
    reps = reps.filter(F.col("media_id") == F.col("keep")).select(
        "media_id", "payload"
    )
    schema = "media_id bigint, " + ", ".join(f"b{k} int" for k in range(N_BANDS))
    return reps.mapInPandas(_sig_batches, schema)


def media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs: banded blockhash candidates
    (agree exactly on ≥1 of 4 bands) verified by full 64-bit hamming
    distance ≤ HAM_MAX."""
    sigs = media_signatures(spark, sf_dir).persist()
    band_arr = F.array(*[F.col(f"b{k}") for k in range(N_BANDS)])
    buckets = sigs.select(
        "media_id", F.posexplode(band_arr).alias("band", "key")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("media_id").alias("media_id_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(N_BANDS)],
    )
    sb = sigs.select(
        F.col("media_id").alias("media_id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(N_BANDS)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")).cast("bigint"))
        for k in range(N_BANDS)
    ).cast("int")
    return (
        cand.join(sa, "media_id_a")
        .join(sb, "media_id_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= HAM_MAX)
        .select("media_id_a", "media_id_b", "hamming")
        .orderBy("media_id_a", "media_id_b")
    )


_PX = (
    f"((i // {PHASH_SIDE}) * h // {PHASH_SIDE}) * {IMG_W}"
    f" + ((i % {PHASH_SIDE}) * {IMG_W} // {PHASH_SIDE}) + 1"
)

MEDIA_NEARDUP_SQL = f"""
WITH img AS (
  SELECT doc_id AS media_id, text, length(text) // {IMG_W} AS h
  FROM documents
  WHERE doc_id % 3 = 0 AND length(text) >= {MIN_BYTES}
), rep AS (
  SELECT min(media_id) AS media_id,
         arg_min(text, media_id) AS text,
         arg_min(h, media_id) AS h
  FROM img GROUP BY md5(text)
), px AS (
  SELECT media_id,
         [ascii(substr(text, {_PX}, 1)) FOR i IN range(0, 64)] AS pix
  FROM rep
), sig AS (
  SELECT media_id,
         CAST(list_sum([CASE WHEN 64 * pix[i + 1] > s THEN (1 << (i % 16)) ELSE 0 END
                        FOR i IN range(0, 16)]) AS INT) AS b0,
         CAST(list_sum([CASE WHEN 64 * pix[i + 1] > s THEN (1 << (i % 16)) ELSE 0 END
                        FOR i IN range(16, 32)]) AS INT) AS b1,
         CAST(list_sum([CASE WHEN 64 * pix[i + 1] > s THEN (1 << (i % 16)) ELSE 0 END
                        FOR i IN range(32, 48)]) AS INT) AS b2,
         CAST(list_sum([CASE WHEN 64 * pix[i + 1] > s THEN (1 << (i % 16)) ELSE 0 END
                        FOR i IN range(48, 64)]) AS INT) AS b3
  FROM (SELECT media_id, pix, list_sum(pix) AS s FROM px)
)
SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
       CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
          + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
          + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
          + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) AS INT)
         AS hamming
FROM sig a JOIN sig b
  ON a.media_id < b.media_id
 AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
    + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
    + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
    + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= {HAM_MAX}
ORDER BY media_id_a, media_id_b
"""


QUERIES = {
    "media_neardup": media_neardup,
}

ORACLES = {
    "media_neardup": MEDIA_NEARDUP_SQL,
}
