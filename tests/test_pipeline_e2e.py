"""End-to-end user story across the round-7 surfaces: multi-array
ingest through dask.store_dask (fork-per-source, one commit), change
capture through the CDC txlog stream, and export through the avro
source helper — each piece is unit-tested elsewhere; this pins that
they compose."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from icechunk_spark.dask import store_dask
from icechunk_spark.repo import Repository
from icechunk_spark.sources import read_avro, write_avro
from icechunk_spark.streaming.events import run_to_memory
from icechunk_spark.streaming.repo_cdc import repo_changes_stream


def test_ingest_cdc_export_pipeline(spark, tmp_path):
    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)
    with repo.transaction(message="schema") as s:
        s.create_array("/u", shape=[64], chunk_shape=[16])
        s.create_array("/v", shape=[64], chunk_shape=[16])

    # ingest: two sources, one fork each, one merge + one commit
    src_u = spark.range(64).select(
        F.col("id").alias("i0"), (F.col("id") * 1.0).alias("value")
    )
    src_v = spark.range(32).select(
        F.col("id").alias("i0"), (F.col("id") * 2.0).alias("value")
    )
    w = repo.writable_session("main")
    w.merge(store_dask(sources=[src_u, src_v], targets=["/u", "/v"], session=w))
    w.commit("bulk ingest")

    # CDC: drain the txlog stream; the ingest commit must show exactly
    # the chunk cells the two sources covered (4 for /u, 2 for /v)
    name = f"cdc_{uuid.uuid4().hex[:8]}"
    run_to_memory(repo_changes_stream(spark, root), name)
    tip = repo.lookup_branch("main")
    per_node = (
        spark.table(name)
        .filter((F.col("snapshot_id") == tip) & (F.col("chunk_key") != ""))
        .groupBy("node_id")
        .agg(F.countDistinct("chunk_key").alias("n"))
        .collect()
    )
    ro = repo.readonly_session()
    by_node = {r["node_id"]: r["n"] for r in per_node}
    assert by_node[ro.get_node_id("/u")] == 4
    assert by_node[ro.get_node_id("/v")] == 2

    # export: aggregate from the store, write avro, read it back
    agg = (
        ro.read_array_df("/u")
        .filter(F.col("value") != 0.0)
        .select((F.col("i0") % 4).alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.sum("value").alias("total"))
        .orderBy("bucket")
    )
    out = str(tmp_path / "export")
    write_avro(agg, out)
    back = read_avro(spark, out).orderBy("bucket")
    assert [r.asDict() for r in back.collect()] == [r.asDict() for r in agg.collect()]
