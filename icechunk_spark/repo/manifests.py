"""Manifest resolution: snapshots carry an ordered list of manifest
parquet files; later rows shadow earlier ones per (node_id, chunk_key)
and ``op='del'`` rows are tombstones (LSM semantics — the Spark
re-expression of icechunk's manifest-split design, design-docs/005).

``rewrite_manifests`` (repository.py) compacts the list back to one
sorted file.  Resolution is a window-dedup — a single shuffle on
(node_id, chunk_key) — and chunk-grid pruning happens BEFORE the
shuffle via plain int columns c0..c3 that push down to parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.repo.format import MANIFEST_SCHEMA, SnapshotInfo, data_path, new_id


def manifest_dir(root: str) -> str:
    return data_path(root, "manifests")


def read_manifest_files(spark: SparkSession, root: str, relpaths: list[str]) -> DataFrame:
    if not relpaths:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    paths = [data_path(root, p) for p in relpaths]
    return spark.read.schema(MANIFEST_SCHEMA).parquet(*paths)


def resolve_manifests(
    spark: SparkSession,
    root: str,
    snap: SnapshotInfo,
    node_id: str | None = None,
    chunk_filter: Column | None = None,
) -> DataFrame:
    """Live chunk refs at a snapshot: latest row per (node_id,
    chunk_key), tombstones dropped.  ``chunk_filter`` (over c0..c3)
    prunes before the dedup shuffle and pushes down to the scan."""
    df = read_manifest_files(spark, root, snap.manifests)
    if node_id is not None:
        df = df.filter(F.col("node_id") == node_id)
    if chunk_filter is not None:
        df = df.filter(chunk_filter)
    w = Window.partitionBy("node_id", "chunk_key").orderBy(F.desc("seq"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == "set"))
        .drop("__rn")
    )


def write_manifest(df: DataFrame, root: str, n_files: int = 1) -> str:
    """Write manifest rows as a new immutable manifest file (dir of
    parquet parts); returns the snapshot-relative path."""
    rel = os.path.join("manifests", f"{new_id()}.parquet")
    out = df.select(*[c.strip().split(" ")[0] for c in MANIFEST_SCHEMA.split(",")])
    writer = out.repartition(n_files) if n_files else out
    writer.write.parquet(data_path(root, rel))
    return rel
