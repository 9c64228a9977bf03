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
    df = read_manifest_files(spark, root, prune_manifest_paths(snap.manifests, node_id))
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


def write_manifests(
    df: DataFrame, root: str, splitting: dict | None = None, n_files: int = 1
) -> list[str]:
    """Write manifest rows as one or more immutable manifest files.

    With ``splitting`` (the persisted form of the reference's
    ManifestSplittingConfig / ManifestSplitCondition —
    icechunk-python/python/icechunk/config.py:59-64, design-docs/005),
    one snapshot's refs are split into per-array files, optionally
    capped at ``max_refs_per_manifest`` rows each, so a snapshot of a
    huge repo never produces one monolithic manifest and readers of a
    single array fetch only that array's files.

    Spark-first: the split is ONE partitioned parquet write
    (``partitionBy`` on a copied node column + a range-ordered bucket),
    not N driver-side writes.  Buckets are ordered by chunk grid
    coordinates so parquet min/max stats on c0..c3 still prune inside
    each split file.  Returns the list of snapshot-relative paths
    (leaf partition dirs), which ``SnapshotInfo.manifests`` stores and
    ``resolve_manifests`` prunes by node before reading.
    """
    splitting = splitting or {}
    max_refs = splitting.get("max_refs_per_manifest")
    if not splitting.get("split_by_array") and not max_refs:
        return [write_manifest(df, root, n_files)]
    base = os.path.join("manifests", f"{new_id()}.parquet")
    cols = [c.strip().split(" ")[0] for c in MANIFEST_SCHEMA.split(",")]
    out = df.select(*cols).withColumn("__node", F.col("node_id"))
    if max_refs:
        w = Window.partitionBy("node_id").orderBy("c0", "c1", "c2", "c3", "chunk_key")
        out = out.withColumn(
            "__split", ((F.row_number().over(w) - 1) / F.lit(int(max_refs))).cast("int")
        )
    else:
        out = out.withColumn("__split", F.lit(0))
    full = data_path(root, base)
    out.write.partitionBy("__node", "__split").parquet(full)
    rels: list[str] = []
    for nd in sorted(os.listdir(full)):
        if not nd.startswith("__node="):
            continue
        for sd in sorted(os.listdir(os.path.join(full, nd))):
            if sd.startswith("__split="):
                rels.append(f"{base}/{nd}/{sd}")
    if not rels:  # empty change set still needs a (single) manifest file
        return [base] if os.path.isdir(full) else []
    return rels


def prune_manifest_paths(relpaths: list[str], node_id: str | None) -> list[str]:
    """File-level pruning for split manifests: when resolving a single
    node, skip split files belonging to other nodes entirely (unsplit
    manifests are always kept — they may contain any node)."""
    if node_id is None:
        return list(relpaths)
    return [p for p in relpaths if "/__node=" not in p or f"/__node={node_id}/" in p]
