"""Small reference-parity API surface: Session.mode/store/config/
flush, Repository.fetch_spec_version/storage/get_metadata (reference:
icechunk-python session.py:74-151, :589; repository.py:475, :603,
:712)."""

from __future__ import annotations

import pytest

from icechunk_spark.repo import Repository
from icechunk_spark.repo.session import SessionMode
from icechunk_spark.repo.storage import Storage


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"), metadata={"team": "ml"})


def test_repository_small_surface(spark, repo):
    assert Repository.fetch_spec_version(repo.root) == 2
    assert isinstance(repo.storage, Storage)
    assert repo.storage.exists("repo.json")
    assert repo.get_metadata() == {"team": "ml"} == repo.metadata()


def test_session_mode_store_config(spark, repo):
    ro = repo.readonly_session()
    assert ro.mode is SessionMode.readonly
    w = repo.writable_session("main")
    assert w.mode is SessionMode.writable
    ra = repo.rearrange_session("main")
    assert ra.mode is SessionMode.rearrange
    # store facade reachable from the session itself
    assert w.store.get("zarr.json") == b'{"zarr_format":3,"node_type":"group"}'
    # config reflects the reopen override
    from icechunk_spark.repo.repository import RepositoryConfig

    r2 = repo.reopen(config=RepositoryConfig(inline_chunk_threshold_bytes=7))
    assert r2.writable_session("main").config().inline_chunk_threshold_bytes == 7


def test_flush_writes_snapshot_without_moving_branch(spark, repo):
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
    tip_before = repo.lookup_branch("main")

    s = repo.writable_session("main")
    s.set_chunk_bytes("/a", "0", b"f" * 4096)
    sid = s.flush("flushed work")
    # branch untouched; session now read-only at the flushed snapshot
    assert repo.lookup_branch("main") == tip_before
    assert s.read_only and s.snapshot_id == sid
    assert s.get_chunk_bytes("/a", "0") == b"f" * 4096
    with pytest.raises(Exception):
        s.set_chunk_bytes("/a", "1", b"x")

    # a coordinator can later publish the flushed snapshot
    repo.reset_branch("main", sid)
    assert repo.lookup_branch("main") == sid
    assert repo.readonly_session().get_chunk_bytes("/a", "0") == b"f" * 4096


def test_store_with_read_only_and_virtual_passthrough(spark, repo, tmp_path):
    """Store-level parity: with_read_only view, virtual-ref
    passthroughs, supports_consolidated_metadata=False
    (reference store.py:102, :246, :610)."""
    import numpy as np

    from icechunk_spark.repo import RefError
    from icechunk_spark.repo.store import ChunkStore

    ext = tmp_path / "ext.bin"
    ext.write_bytes(np.arange(4, dtype="float64").tobytes())

    s = repo.writable_session("main")
    s.create_array("/v", shape=[4], chunk_shape=[4])
    store = ChunkStore(s)
    assert store.supports_consolidated_metadata is False
    store.set_virtual_ref("v/c/0", str(ext), offset=0, length=32)
    assert store.get("v/c/0") == ext.read_bytes()
    with pytest.raises(RefError, match="metadata key"):
        store.set_virtual_ref("v/zarr.json", str(ext), offset=0, length=32)

    ro = store.with_read_only(read_only=True)
    # same session underneath: the read-only VIEW still sees the
    # uncommitted array, but refuses writes
    assert ro.session is store.session
    assert ro.get("v/zarr.json") is not None
    assert not ro.supports_writes and store.supports_writes
    with pytest.raises(RefError, match="read-only"):
        ro.set("v/c/1", b"x" * 32)
    with pytest.raises(RefError, match="read-only"):
        ro.set_virtual_ref("v/c/1", str(ext), offset=0, length=32)
    # a store over a READ-ONLY SESSION cannot be escalated
    committed = ChunkStore(repo.readonly_session())
    with pytest.raises(RefError, match="read-only session"):
        committed.with_read_only(read_only=False)
    assert store.with_read_only(read_only=False) is store


def test_upgrade_repository_invalidates_old_handle(spark, tmp_path, capsys):
    """icechunk.upgrade_icechunk_repository parity: migrates in place,
    returns a fresh handle, and the old handle raises on any use."""
    from icechunk_spark import print_debug_info
    from icechunk_spark.repo import (
        supported_spec_versions,
        upgrade_icechunk_repository,
    )

    assert supported_spec_versions() == [2, 1]

    root = str(tmp_path / "up")
    old = Repository.create(spark, root, spec_version=1)
    # dry run: nothing changes, same handle back
    assert upgrade_icechunk_repository(old, dry_run=True) is old
    assert Repository.fetch_spec_version(root) == 1
    new = upgrade_icechunk_repository(old, dry_run=False)
    assert Repository.fetch_spec_version(root) == 2
    assert new.spec_version() == 2
    with pytest.raises(RuntimeError, match="invalidated"):
        old.list_branches()

    print_debug_info()
    out = capsys.readouterr().out
    assert "icechunk_spark:" in out and "pyspark:" in out


def test_r6_signature_parity_surface(spark, tmp_path):
    """Round-6 parameter-level parity sweep (signature diff vs the
    reference): datetime cutoffs, conditional reset, amend-compaction,
    scoped ancestry graph, byte-range store gets, clean-root probe."""
    import datetime as dt

    from icechunk_spark.errors import AlreadyExistsError, IcechunkError
    from icechunk_spark.repo import Repository, StorageConflict
    from icechunk_spark.repo.store import ChunkStore

    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)
    with repo.transaction(message="c0") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"abcdefgh" * 512)
    first = repo.lookup_branch("main")
    with repo.transaction(message="c1") as s:
        s.set_chunk_bytes("/a", "0", b"ZYXWVUTS" * 512)
    tip = repo.lookup_branch("main")

    # expire_snapshots(older_than=datetime) — reference signature
    future = dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    expired = repo.expire_snapshots(older_than=future)
    assert first in expired
    with pytest.raises(ValueError, match="exactly one"):
        repo.expire_snapshots(86400, older_than=future)

    # garbage_collect(delete_object_older_than=datetime) + advisory caps
    summary = repo.garbage_collect(
        delete_object_older_than=dt.datetime.fromtimestamp(0, dt.timezone.utc),
        dry_run=True,
        max_snapshots_in_memory=7,
    )
    assert summary.snapshots_deleted == 0  # nothing older than epoch

    # reset_branch conditional on from_snapshot_id
    with pytest.raises(StorageConflict, match="refusing"):
        repo.reset_branch("main", first, from_snapshot_id=first)
    repo.reset_branch("main", first, from_snapshot_id=tip)
    assert repo.lookup_branch("main") == first
    repo.reset_branch("main", tip)

    # rewrite_manifests(commit_method="amend"): history length unchanged
    n_before = len(list(repo.ancestry(branch="main")))
    sid = repo.rewrite_manifests(commit_method="amend", metadata={"who": "t"})
    chain = list(repo.ancestry(branch="main"))
    assert len(chain) == n_before and chain[0].id == sid
    assert chain[0].metadata["who"] == "t" and chain[0].message == "c1"
    ro = repo.readonly_session()
    assert ro.get_chunk_bytes("/a", "0") == b"ZYXWVUTS" * 512

    # scoped ancestry graph
    g = repo.ancestry_graph(branch="main", plain=True)
    assert "branch:main" in str(g)

    # inspect_manifest(manifest_id=...)
    man_rel = chain[0].manifests[0]
    man_id = man_rel.rsplit("/", 1)[-1][: -len(".parquet")]
    byid = repo.inspect_manifest(manifest_id=man_id)
    bypath = repo.inspect_manifest(man_rel)
    assert byid == bypath

    # store byte_range gets + prototype-first get_partial_values
    store = ChunkStore(repo.readonly_session())
    raw = store.get("a/c/0")
    assert store.get("a/c/0", None, (2, 6)) == raw[2:6]
    assert store.get("a/c/0", None, 5) == raw[5:]
    assert store.get_partial_values(object(), [("a/c/0", (1, 3))]) == [raw[1:4]]

    # amend(allow_empty)
    s2 = repo.writable_session()
    with pytest.raises(IcechunkError, match="nothing to amend"):
        s2.amend()
    s2.amend(allow_empty=True)

    # create(check_clean_root): leftover objects refuse unless waived
    dirty = str(tmp_path / "dirty")
    import os

    os.makedirs(os.path.join(dirty, "chunks", "ab"))
    with pytest.raises(AlreadyExistsError, match="leftover"):
        Repository.create(spark, dirty)
    Repository.create(spark, dirty, check_clean_root=False)

    # create/open accept the reference's storage= keyword
    from icechunk_spark.repo import in_memory_storage

    st = in_memory_storage()
    r2 = Repository.create(spark, storage=st)
    assert Repository.open(spark, storage=st).list_branches() == r2.list_branches()


def test_async_ancestry(spark, tmp_path):
    """async_ancestry is a working async generator matching ancestry
    (reference repository.py:984)."""
    import asyncio

    from icechunk_spark.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    with repo.transaction(message="c0") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])

    async def collect():
        return [s.id async for s in repo.async_ancestry(branch="main")]

    got = asyncio.run(collect())
    assert got == [s.id for s in repo.ancestry(branch="main")]
    assert len(got) == 2
