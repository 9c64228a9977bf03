"""Expired-transaction-log lifecycle (design-docs/016-expired-
transaction-logs.md): expiration carries the txlog ids of pruned
ancestors on the re-parented boundary snapshot, GC keeps those logs
alive after the snapshots are reclaimed, and rebase across the pruned
gap still sees their changes (erroring loudly if a carried log is
missing rather than silently hiding conflicts).
"""

from __future__ import annotations

import time

import pytest

from icechunk_spark.repo import RefError, Repository
from icechunk_spark.repo import format as fmt
from icechunk_spark.repo import fsio


def _tx_path(root: str, sid: str) -> str:
    return fmt.data_path(root, f"txlogs/{sid}.parquet")


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"))


def _setup_pruned_boundary(repo):
    """History root -> B -> C(tip); expire B so C re-parents onto the
    root carrying B's txlog id.  Returns (b_id, c_id)."""
    with repo.transaction(message="B") as s:
        s.create_array("/a", shape=[16], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"b" * 16)
    b_id = repo.lookup_branch("main")
    with repo.transaction(message="C") as s:
        s.set_chunk_bytes("/a", "1", b"c" * 16)
    c_id = repo.lookup_branch("main")
    expired = repo.expire_snapshots(0.0, now=time.time() + 3600)
    assert expired == {b_id}
    return b_id, c_id


def test_expiration_carries_pruned_txlog_ids(repo):
    b_id, c_id = _setup_pruned_boundary(repo)
    tip = fmt.read_snapshot(repo.root, c_id)
    assert tip.pruned_ancestor_tx_logs == [b_id]
    # the boundary now parents on the root
    root_id = list(repo.ancestry(branch="main"))[-1].id
    assert tip.parent_id == root_id


def test_gc_keeps_carried_txlogs_forever(repo):
    b_id, _ = _setup_pruned_boundary(repo)
    assert fsio.exists(_tx_path(repo.root, b_id))
    # age cutoff 0: everything unreachable is reclaimable immediately
    summary = repo.garbage_collect(older_than_seconds=-3600)
    assert summary.snapshots_deleted >= 1  # B's snapshot file is gone
    with pytest.raises(RefError):
        fmt.read_snapshot(repo.root, b_id)
    # ... but its txlog survives: a live boundary snapshot carries it
    assert fsio.exists(_tx_path(repo.root, b_id))
    # and a SECOND gc still keeps it (orphan enumeration honors the
    # carried set even though B is no longer in snapshots/)
    repo.garbage_collect(older_than_seconds=-3600)
    assert fsio.exists(_tx_path(repo.root, b_id))


def test_rebase_sees_carried_logs_across_pruned_gap(repo):
    """A session whose base predates the pruned gap must still detect
    conflicts against the expired commits' changes.  (After
    re-parenting, the only surviving base below the boundary is the
    branch root, so the session opens on the fresh repo.)"""
    from icechunk_spark.repo.session import ConflictError

    s1 = repo.writable_session("main")  # base = repo root snapshot
    b_id, _ = _setup_pruned_boundary(repo)  # B (creates /a) expired into C
    repo.garbage_collect(older_than_seconds=-3600)  # B's snapshot is gone
    # s1 creates the SAME PATH the expired commit B created: the
    # create/create conflict is recorded only in B's carried txlog now
    s1.create_array("/a", shape=[16], chunk_shape=[4])
    with pytest.raises(ConflictError):
        s1.commit("recreate a")


def test_rebase_errors_when_carried_log_missing(repo):
    """Missing carried log = conflicts cannot be checked: rebase must
    ERROR, not silently proceed (design-doc 016 rebase rule)."""
    s1 = repo.writable_session("main")  # base = repo root snapshot
    b_id, _ = _setup_pruned_boundary(repo)
    # simulate an old GC binary having deleted the carried log
    assert fsio.delete_dir(_tx_path(repo.root, b_id))
    s1.create_group("/other")  # no real conflict
    with pytest.raises(RefError, match="expired commit"):
        s1.commit("write elsewhere")


def test_repeated_expiration_accumulates(repo):
    """A later expiration's boundary inherits the earlier boundary's
    carried list (accumulation across repeated expirations)."""
    b_id, c_id = _setup_pruned_boundary(repo)
    # new tip D, then expire C: D should carry [B, C] oldest-first
    with repo.transaction(message="D") as s:
        s.set_chunk_bytes("/a", "2", b"d" * 16)
    d_id = repo.lookup_branch("main")
    expired = repo.expire_snapshots(0.0, now=time.time() + 3600)
    assert expired == {c_id}
    tip = fmt.read_snapshot(repo.root, d_id)
    assert tip.pruned_ancestor_tx_logs == [b_id, c_id]


def test_inspect_surfaces_carried_logs(repo):
    b_id, c_id = _setup_pruned_boundary(repo)
    tx = repo.inspect_transaction_log(c_id)
    assert tx["pruned_ancestor_tx_logs"] == [b_id]
