"""Distributed ND-array encode/decode between DataFrames and chunk
payloads.

Write path: rows (i0..ik, value) → chunk-grid assignment (JVM-side
floor-div) → one shuffle groupBy chunk → ``applyInPandas`` packs each
chunk into a dense numpy buffer (fill-value initialized, C-order
bytes) → one parquet dir holds payloads AND the manifest columns, so
the staged manifest is a column-pruned re-scan (payload never read).

Read path: resolved manifest (pruned on c0..c3) → join payload files
on chunk_id → ``mapInPandas`` unpacks buffers back to coordinate rows,
applying slice bounds per chunk before emitting.

This is the Spark-native equivalent of icechunk's Zarr chunk I/O
(icechunk/src/store.rs): same chunk-grid model, but the codec runs
data-parallel on executors instead of in a client process.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.repo.format import ArrayMeta, data_path

CHUNK_FILE_SCHEMA_SUFFIX = (
    "chunk_key string, c0 int, c1 int, c2 int, c3 int, chunk_id string, "
    "n_bytes bigint, payload binary"
)


def coord_cols(ndim: int) -> list[str]:
    return [f"i{d}" for d in range(ndim)]


def encode_array_chunks(
    df: DataFrame, meta: ArrayMeta, out_dir: str
) -> None:
    """Pack coordinate rows into dense chunk payloads and write them
    (with manifest columns) to ``out_dir``."""
    ndim = len(meta.shape)
    cols = coord_cols(ndim)
    for d, c in enumerate(cols):
        if c not in df.columns:
            raise ValueError(f"missing coordinate column {c}")
        # integer floor-div (``div``), not double divide + truncate:
        # exact above 2^53 and correct for negative coordinates
        df = df.withColumn(
            f"__ck{d}",
            F.expr(f"CAST({c} AS BIGINT) div {meta.chunk_shape[d]}").cast("int"),
        )
    chunk_shape = list(meta.chunk_shape)
    dtype = meta.dtype
    fill = meta.fill_value

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        ck = [int(pdf[f"__ck{d}"].iloc[0]) for d in range(ndim)]
        buf = np.full(chunk_shape, fill, dtype=dtype)
        idx = tuple(
            pdf[f"i{d}"].to_numpy(dtype=np.int64) - ck[d] * chunk_shape[d] for d in range(ndim)
        )
        buf[idx] = pdf["value"].to_numpy(dtype=dtype)
        payload = buf.tobytes()
        c = ck + [None] * (4 - ndim)
        return pd.DataFrame(
            {
                "chunk_key": [".".join(str(x) for x in ck)],
                "c0": pd.array([c[0]], dtype="Int32"),
                "c1": pd.array([c[1]], dtype="Int32"),
                "c2": pd.array([c[2]], dtype="Int32"),
                "c3": pd.array([c[3]], dtype="Int32"),
                "chunk_id": [uuid.uuid4().hex],
                "n_bytes": [len(payload)],
                "payload": [payload],
            }
        )

    (
        df.groupBy(*[f"__ck{d}" for d in range(ndim)])
        .applyInPandas(pack, CHUNK_FILE_SCHEMA_SUFFIX)
        .write.parquet(out_dir)
    )


def staged_manifest_from_chunk_dir(
    spark: SparkSession, chunk_dir_abs: str, chunk_file_rel: str, node_id: str
) -> DataFrame:
    """Manifest rows for a freshly written chunk dir — column pruning
    means the payload column is never read here.  The schema is pinned
    (it is exactly what encode_array_chunks just wrote), so the read
    skips the driver-side footer schema-inference pass."""
    scan = spark.read.schema(CHUNK_FILE_SCHEMA_SUFFIX).parquet(chunk_dir_abs)
    return scan.select(
        F.lit(node_id).alias("node_id"),
        "chunk_key",
        "c0",
        "c1",
        "c2",
        "c3",
        "chunk_id",
        F.lit(chunk_file_rel).alias("file"),
        "n_bytes",
        F.lit("set").alias("op"),
        F.lit(False).alias("is_virtual"),
        F.lit(None).cast("string").alias("vpath"),
        F.lit(None).cast("bigint").alias("voffset"),
        F.lit(None).cast("bigint").alias("vlength"),
        F.lit(None).cast("binary").alias("inline"),
        F.lit(0).cast("bigint").alias("seq"),
        F.lit(None).cast("string").alias("vchecksum"),
    )


def slice_chunk_filter(meta: ArrayMeta, slices: list[tuple[int, int]] | None) -> Column | None:
    """Chunk-grid pruning predicate over c0..c3 for a coordinate slice."""
    if slices is None:
        return None
    cond = F.lit(True)
    for d, (start, stop) in enumerate(slices):
        cs = meta.chunk_shape[d]
        cond = cond & (F.col(f"c{d}") >= start // cs) & (F.col(f"c{d}") <= (max(stop - 1, start)) // cs)
    return cond


def decode_chunks_to_rows(
    spark: SparkSession,
    root: str,
    manifest: DataFrame,
    meta: ArrayMeta,
    slices: list[tuple[int, int]] | None = None,
    vcc_map: dict[str, str] | None = None,
    files: list[str] | None = None,
) -> DataFrame:
    """Unpack chunk payloads back into (i0..ik, value) rows.
    ``vcc_map`` (name -> url_prefix) resolves ``vcc://`` relative
    virtual refs inside executor tasks (design-doc 014).

    ``files`` (optional) is the chunk-file list to open; a SUPERSET of
    the live files is harmless (extra payload rows simply find no
    match in the left join on chunk_id), which lets callers list
    files from a column-pruned pre-dedup manifest scan instead of
    executing the full latest-row-per-chunk window here — that
    default path below re-runs the caller's whole resolve plan just
    to enumerate files (measured 2.3 s of the sf0.1 roundtrip read)."""
    ndim = len(meta.shape)
    if files is None:
        files = [
            r["file"]
            for r in manifest.select("file").distinct().collect()
            if r["file"] is not None
        ]
    else:
        files = [f for f in files if f is not None]
    refs = manifest.select(
        "chunk_key", "chunk_id", "is_virtual", "vpath", "voffset", "vlength", "inline",
        "vchecksum",
    )
    if files:
        payloads = spark.read.parquet(*[data_path(root, f) for f in files]).select(
            "chunk_id", "payload"
        )
        joined = refs.join(payloads, "chunk_id", "left")
    else:
        joined = refs.withColumn("payload", F.lit(None).cast("binary"))

    shape = list(meta.shape)
    chunk_shape = list(meta.chunk_shape)
    dtype = meta.dtype
    bounds = slices

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icechunk_spark.repo import fsio
        from icechunk_spark.repo.session import check_virtual_checksum, resolve_vcc

        # many refs share one external file: validate each (path,
        # checksum) pair once per task, not once per chunk row
        checked: set[tuple[str, str]] = set()

        for pdf in batches:
            for _, row in pdf.iterrows():
                ck = [int(x) for x in row["chunk_key"].split(".")]
                if row["is_virtual"]:
                    vp = resolve_vcc(row["vpath"], vcc_map)
                    vchk = row.get("vchecksum")
                    if vchk and (vp, vchk) not in checked:
                        check_virtual_checksum(vp, vchk)
                        checked.add((vp, vchk))
                    raw = fsio.read_range(vp, int(row["voffset"]), int(row["vlength"]))
                elif row["inline"] is not None:
                    raw = row["inline"]
                else:
                    raw = row["payload"]
                    if raw is None:
                        continue
                buf = np.frombuffer(bytes(raw), dtype=dtype).reshape(chunk_shape)
                grids = np.indices(chunk_shape).reshape(ndim, -1)
                coords = [grids[d] + ck[d] * chunk_shape[d] for d in range(ndim)]
                mask = np.ones(coords[0].shape, dtype=bool)
                for d in range(ndim):
                    mask &= coords[d] < shape[d]  # crop boundary chunks
                    if bounds is not None:
                        mask &= (coords[d] >= bounds[d][0]) & (coords[d] < bounds[d][1])
                if not mask.any():
                    continue
                out = {f"i{d}": coords[d][mask] for d in range(ndim)}
                out["value"] = buf.reshape(-1)[mask]
                yield pd.DataFrame(out)

    value_type = {"float64": "double", "float32": "float", "int64": "bigint", "int32": "int"}[dtype]
    schema = ", ".join([f"i{d} bigint" for d in range(ndim)] + [f"value {value_type}"])
    return joined.mapInPandas(unpack, schema)
