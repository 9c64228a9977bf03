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
