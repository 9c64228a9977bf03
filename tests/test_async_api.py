"""Async API surface sweep (reference parity: the ``*_async`` twins —
icechunk-python repository.py:157, :262, :453, :580, :735, :1052+,
session.py:182-:659, store.py:116-:671).

Every generated twin must await to the SAME result as its sync twin
(or perform the same mutation), and the twins must be real coroutine
functions — not sync methods with an async name.  No pytest-asyncio in
the container, so each test drives its own ``asyncio.run``.
"""

from __future__ import annotations

import asyncio
import inspect

import pytest

from icechunk_spark.repo import Repository, Session
from icechunk_spark.repo import aio
from icechunk_spark.repo.store import ChunkStore


def run(coro):
    return asyncio.run(coro)


@pytest.fixture()
def repo(spark, tmp_path):
    r = Repository.create(spark, str(tmp_path / "repo"))
    with r.transaction(message="v1") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"x" * 1024)
        s.set_chunk_bytes("/a", "1", b"tiny")
    return r


def test_every_twin_is_a_real_coroutine_function():
    """Spec completeness: each mapped name exists on the class, is
    newly generated (not the sync method under an alias), and has the
    right async flavor."""
    for cls, spec in [
        (Repository, aio.REPOSITORY_ASYNC),
        (Session, aio.SESSION_ASYNC),
        (ChunkStore, aio.STORE_ASYNC),
    ]:
        for name, kind in spec.items():
            twin = inspect.getattr_static(cls, name + "_async")
            if isinstance(twin, staticmethod):
                twin = twin.__func__
            if kind == "gen":
                # factory returning an async generator
                assert callable(twin), name
            else:
                assert asyncio.iscoroutinefunction(twin), name


def test_async_lifecycle(spark, tmp_path):
    root = str(tmp_path / "arepo")

    async def flow():
        assert not await Repository.exists_async(root)
        repo = await Repository.create_async(spark, root)
        assert await Repository.exists_async(root)
        again = await Repository.open_async(spark, root)
        assert again.root == repo.root
        third = await Repository.open_or_create_async(spark, root)
        assert third.root == repo.root
        assert await Repository.fetch_spec_version_async(
            root
        ) == Repository.fetch_spec_version(root)
        await repo.save_config_async(repo.config())
        cfg = await Repository.fetch_config_async(root)
        assert cfg is not None and cfg.to_dict() == repo.config().to_dict()
        re = await repo.reopen_async()
        assert re.root == repo.root

    run(flow())


def test_async_metadata_status_flags(spark, repo):
    async def flow():
        await repo.set_metadata_async({"team": "data"})
        assert (await repo.get_metadata_async()) == repo.get_metadata()
        merged = await repo.update_metadata_async({"tier": "gold"})
        assert merged["tier"] == "gold"
        # a repo with no stored status stamps set_at at read time, so
        # compare the durable field
        assert (await repo.get_status_async()).availability == repo.get_status().availability
        flags = await repo.feature_flags_async()
        assert flags == repo.feature_flags()
        assert (await repo.enabled_feature_flags_async()) == repo.enabled_feature_flags()
        assert (
            await repo.disabled_feature_flags_async()
        ) == repo.disabled_feature_flags()

    run(flow())


def test_async_refs_and_history(spark, repo):
    async def flow():
        tip = await repo.lookup_branch_async("main")
        assert tip == repo.lookup_branch("main")
        await repo.create_branch_async("dev", snapshot_id=tip)
        assert (await repo.list_branches_async()) == repo.list_branches()
        await repo.create_tag_async("v1.0", snapshot_id=tip)
        assert (await repo.list_tags_async()) == repo.list_tags()
        assert (await repo.lookup_tag_async("v1.0")) == tip
        snap = await repo.lookup_snapshot_async(tip)
        assert snap.id == tip
        # async generators: ops_log + the hand-written async_ancestry
        ops = [u async for u in repo.ops_log_async()]
        assert [u.to_dict() for u in ops] == [u.to_dict() for u in repo.ops_log()]
        hist = [s.id async for s in repo.async_ancestry(branch="main")]
        assert hist == [s.id for s in repo.ancestry(branch="main")]
        graph = await repo.ancestry_graph_async(plain=True)
        assert str(graph) == str(repo.ancestry_graph(plain=True))
        await repo.delete_tag_async("v1.0")
        await repo.reset_branch_async("dev", snapshot_id=tip)
        await repo.delete_branch_async("dev")
        assert "dev" not in repo.list_branches()

    run(flow())


def test_async_sessions_diff_inspect(spark, repo):
    async def flow():
        ro = await repo.readonly_session_async()
        assert ro.read_only and ro.snapshot_id == repo.lookup_branch("main")
        w = await repo.writable_session_async("main")
        assert not w.read_only
        ra = await repo.rearrange_session_async("main")
        assert ra._rearrange_only
        tip = repo.lookup_branch("main")
        d = await repo.diff_async(to_snapshot_id=tip, from_snapshot_id=tip)
        assert d.chunks_written == 0 and d.chunks_deleted == 0
        assert (await repo.inspect_repo_info_async()) == repo.inspect_repo_info()
        assert (await repo.inspect_snapshot_async(tip)) == repo.inspect_snapshot(tip)
        files = await repo.list_manifest_files_async(snapshot_id=tip)
        assert files == repo.list_manifest_files(snapshot_id=tip)
        if files:
            assert (
                await repo.inspect_manifest_async(files[0])
            ) == repo.inspect_manifest(files[0])
        assert (
            await repo.inspect_transaction_log_async(tip)
        ) == repo.inspect_transaction_log(tip)

    run(flow())


def test_async_maintenance(spark, repo):
    async def flow():
        # second commit so compaction/expiry have something to fold
        with repo.transaction(message="v2") as s:
            s.set_chunk_bytes("/a", "1", b"tiny2")
        stats_sync = repo.chunk_storage_stats().collect()
        stats_async = (await repo.chunk_storage_stats_async()).collect()
        assert sorted(map(str, stats_async)) == sorted(map(str, stats_sync))
        assert (
            await repo.total_chunks_storage_async()
        ) == repo.total_chunks_storage()
        await repo.rewrite_manifests_async(message="compact")
        expired = await repo.expire_snapshots_async(older_than_seconds=10**9)
        assert isinstance(expired, set)
        summary = await repo.garbage_collect_async(dry_run=True)
        assert summary is not None

    run(flow())


def test_async_session_twins(spark, repo):
    async def flow():
        w = repo.writable_session("main")
        assert (await w.get_node_id_async("/a")) == w.get_node_id("/a")
        assert (await w.all_virtual_chunk_locations_async()) == []
        ct = await w.chunk_type_async("/a", "0")
        assert ct == w.chunk_type("/a", "0")
        coords = [c async for c in w.chunk_coordinates_async("/a")]
        assert coords == list(w.chunk_coordinates("/a"))
        await w.move_async("/a", "/b")
        assert w.get_node_id("/b")
        sid = await w.commit_async("rename via async")
        assert repo.lookup_branch("main") == sid
        # fork/merge/amend through the twins
        w2 = repo.writable_session("main")
        f = w2.fork()
        f.set_chunk_bytes("/b", "1", b"forked")
        await w2.merge_async(f)
        sid2 = await w2.commit_async("fork merge")
        w3 = repo.writable_session("main")
        w3.set_chunk_bytes("/b", "0", b"y" * 1024)
        sid3 = await w3.amend_async("amended")
        assert repo.lookup_branch("main") == sid3 != sid2
        # ForkSession.commit_async must hit the fork's override, which
        # refuses to commit
        f2 = repo.writable_session("main").fork()
        with pytest.raises(Exception, match="ForkSession"):
            await f2.commit_async("nope")

    run(flow())


def test_async_store_twins(spark, repo):
    async def flow():
        store = ChunkStore(repo.writable_session("main"))
        assert not await store.is_empty_async("")
        doc = await store.get_async("a/zarr.json")
        assert doc == store.get("a/zarr.json")
        assert await store.exists_async("a/c/0")
        assert (await store.getsize_async("a/c/0")) == store.getsize("a/c/0")
        assert (await store.getsize_prefix_async("a/c/")) == store.getsize_prefix(
            "a/c/"
        )
        pv = await store.get_partial_values_async([("a/c/0", (0, 4))])
        assert pv == store.get_partial_values([("a/c/0", (0, 4))])
        await store.set_async("a/c/1", b"async-bytes")
        assert store.get("a/c/1") == b"async-bytes"
        await store.set_partial_values_async([("a/c/1", 0, b"ASYNC")])
        assert store.get("a/c/1").startswith(b"ASYNC")
        assert not await store.set_if_not_exists_async("a/c/1", b"no")
        await store.delete_async("a/c/1")
        assert not store.exists("a/c/1")
        await store.delete_dir_async("a/c")
        assert not store.exists("a/c/0")
        await store.clear_async()
        assert list(store.list_prefix("a")) == []

    run(flow())


def test_concurrent_write_twins_serialize_on_one_session(spark, repo):
    """Write twins hold a per-session lock (ADVICE r7): 24 concurrently
    awaited set_async calls on one session must all land intact — no
    interleaved buffer corruption — and the lock is installed on the
    SESSION so store- and session-level writes serialize together."""
    w = repo.writable_session("main")
    with_store = ChunkStore(w)
    w.create_array("/conc", shape=[48], chunk_shape=[2])

    async def flow():
        await asyncio.gather(
            *[
                with_store.set_async(f"conc/c/{i}", bytes([i]) * 700)
                for i in range(24)
            ]
        )

    run(flow())
    assert "_async_write_lock" in w.__dict__  # lock lives on the session
    w.commit("concurrent async writes")
    ro = repo.readonly_session()
    for i in range(24):
        assert ro.get_chunk_bytes("/conc", str(i)) == bytes([i]) * 700
