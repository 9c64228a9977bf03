"""Ecosystem glue helpers (reference parity:
icechunk-python/python/icechunk/distributed.py:33/:56, xarray.py:23,
dask.py:61) — the named functions a reference user's distributed-write
recipes import."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icechunk_spark.dask import store_dask
from icechunk_spark.distributed import extract_session, merge_sessions
from icechunk_spark.repo import Repository
from icechunk_spark.repo.errbase import IcechunkError
from icechunk_spark.repo.store import ChunkStore
from icechunk_spark.xarray import to_icechunk


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"))


def _rows(spark, lo, hi, scale=1.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("i0"), (F.col("id") * scale).cast("double").alias("value")
    )


def test_extract_session(spark, repo):
    s = repo.readonly_session()
    assert extract_session(ChunkStore(s)) is s
    assert extract_session(s) is s
    # reduction-tree kwargs are accepted and ignored
    assert extract_session(ChunkStore(s), axis=0, keepdims=True) is s
    with pytest.raises(TypeError, match="extract"):
        extract_session(object())


def test_merge_sessions_nested_and_typed(spark, repo):
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[64], chunk_shape=[16])
    w = repo.writable_session("main")
    f1, f2, f3 = w.fork(), w.fork(), w.fork()
    f1.write_array_df("/a", _rows(spark, 0, 16))
    f2.write_array_df("/a", _rows(spark, 16, 32))
    f3.write_array_df("/a", _rows(spark, 32, 48))
    # nested-list flattening, merge into the FIRST fork (the reference
    # contract for reduction frameworks)
    merged = merge_sessions(f1, [f2, [f3]])
    assert merged is f1
    w.merge(merged)
    sid = w.commit("three forks")
    got = (
        repo.readonly_session(snapshot_id=sid)
        .read_array_df("/a", slices=[(0, 48)])
        .agg(F.sum("value").alias("s"))
        .collect()[0]["s"]
    )
    assert got == sum(range(48))
    with pytest.raises(TypeError, match="ForkSession"):
        merge_sessions(w)
    with pytest.raises(TypeError):
        merge_sessions()


def test_to_icechunk_modes(spark, repo):
    with repo.transaction(message="v1") as s:
        # create with inferred shape
        to_icechunk(_rows(spark, 0, 100), s, path="/x", chunk_shape=[32])
        assert s.array_meta("/x").shape == [100]
    # r+ writes into the existing array; writes are chunk-granular
    # (a rewritten chunk is fully replaced), so write a whole chunk
    with repo.transaction(message="v2") as s:
        to_icechunk(_rows(spark, 0, 32, scale=2.0), s, path="/x", mode="r+")
    v = (
        repo.readonly_session()
        .read_array_df("/x", slices=[(0, 100)])
        .agg(F.sum("value").alias("s"))
        .collect()[0]["s"]
    )
    # chunk 0 (days [0,32)) doubled, the rest original
    assert v == sum(i * 2.0 for i in range(32)) + sum(range(32, 100))
    with repo.transaction(message="v3") as s:
        to_icechunk(
            _rows(spark, 0, 10), s, path="/x", mode="w", shape=[10], chunk_shape=[5]
        )
    assert repo.readonly_session().array_meta("/x").shape == [10]
    # error contracts
    w = repo.writable_session("main")
    with pytest.raises(IcechunkError, match="r\\+"):
        to_icechunk(_rows(spark, 0, 4), w, path="/nope", mode="r+")
    with pytest.raises(IcechunkError, match="chunk_shape"):
        to_icechunk(_rows(spark, 0, 4), w, path="/new")
    with pytest.raises(IcechunkError, match="mode"):
        to_icechunk(_rows(spark, 0, 4), w, path="/new", mode="z")
    w.discard_changes()


def test_store_dask_multi_array(spark, repo):
    with repo.transaction(message="init") as s:
        s.create_array("/u", shape=[40], chunk_shape=[10])
        s.create_array("/v", shape=[40], chunk_shape=[10])
    w = repo.writable_session("main")
    merged = store_dask(
        sources=[_rows(spark, 0, 40), _rows(spark, 0, 40, scale=3.0)],
        targets=["/u", "/v"],
        session=w,
        split_every=2,
    )
    w.merge(merged)
    w.commit("store_dask")
    ro = repo.readonly_session()
    su = ro.read_array_df("/u").agg(F.sum("value").alias("s")).collect()[0]["s"]
    sv = ro.read_array_df("/v").agg(F.sum("value").alias("s")).collect()[0]["s"]
    assert su == sum(range(40))
    assert sv == sum(i * 3.0 for i in range(40))


def test_store_dask_regions(spark, repo):
    with repo.transaction(message="init") as s:
        s.create_array("/r", shape=[40], chunk_shape=[10])
    w = repo.writable_session("main")
    # in-bounds region write works
    merged = store_dask(
        sources=[_rows(spark, 0, 10)],
        targets=["/r"],
        session=w,
        regions=[((0, 10),)],
    )
    w.merge(merged)
    w.commit("region ok")
    # out-of-region rows are rejected, not dropped
    w2 = repo.writable_session("main")
    with pytest.raises(IcechunkError, match="outside"):
        store_dask(
            sources=[_rows(spark, 0, 20)],
            targets=["/r"],
            session=w2,
            regions=[((0, 10),)],
        )
    with pytest.raises(IcechunkError, match="pair"):
        store_dask(sources=[_rows(spark, 0, 5)], targets=[], session=w2)


def test_no_legacy_zarr_passthrough():
    """Reference #2312 (xarray half) pinned N/A: the reference fix
    REMOVED dead ``synchronizer``/``zarr_version`` passthrough from
    its ``to_icechunk``; this signature never accepted them (there is
    no zarr library underneath), so the fix has no analog — and this
    pin fails if someone ever adds them back."""
    import inspect

    from icechunk_spark.xarray import to_icechunk

    params = set(inspect.signature(to_icechunk).parameters)
    assert params.isdisjoint({"synchronizer", "zarr_version", "zarr_format"})
