"""Admin plane: RepoStatus, feature flags, ops_log (reference parity:
Repository.get_status/set_status repository.py:798-851,
feature_flags.rs registry + guards, Repository.ops_log:1067)."""

from __future__ import annotations

import pytest

from icechunk_spark.repo import (
    FeatureFlagDisabled,
    RefError,
    RepoAvailability,
    RepoStatus,
    Repository,
)


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"))


def test_status_defaults_online_and_roundtrips(spark, repo):
    st = repo.get_status()
    assert st.availability is RepoAvailability.online
    repo.set_status(
        RepoStatus(
            availability=RepoAvailability.read_only,
            limited_availability_reason="maintenance window",
        )
    )
    st2 = Repository.open(spark, repo.root).status
    assert st2.availability is RepoAvailability.read_only
    assert st2.limited_availability_reason == "maintenance window"


def test_read_only_status_blocks_writes(spark, repo):
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
    tip = repo.lookup_branch("main")
    repo.set_status(RepoStatus(availability=RepoAvailability.read_only))
    with pytest.raises(RefError, match="read-only"):
        repo.writable_session("main")
    with pytest.raises(RefError, match="read-only"):
        repo.create_branch("dev", tip)
    # reads still work
    assert repo.readonly_session().list_nodes()
    # back online: writes resume
    repo.set_status(RepoStatus(availability=RepoAvailability.online))
    repo.create_branch("dev", tip)


def test_feature_flags_registry_and_settings(spark, repo):
    flags = {f.name: f for f in repo.feature_flags()}
    assert set(flags) == {"move_node", "create_tag", "delete_tag"}
    assert all(f.enabled and f.in_default_state for f in flags.values())
    assert flags["move_node"].id == 3

    repo.set_feature_flag("create_tag", False)
    assert {f.name for f in repo.disabled_feature_flags()} == {"create_tag"}
    assert "create_tag" not in {f.name for f in repo.enabled_feature_flags()}
    repo.set_feature_flag("create_tag", None)  # reset to default
    assert repo.disabled_feature_flags() == []
    with pytest.raises(KeyError):
        repo.set_feature_flag("nope", True)


def test_disabled_flags_guard_operations(spark, repo):
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
    tip = repo.lookup_branch("main")

    repo.set_feature_flag("create_tag", False)
    with pytest.raises(FeatureFlagDisabled):
        repo.create_tag("v1", tip)
    repo.set_feature_flag("create_tag", None)
    repo.create_tag("v1", tip)

    repo.set_feature_flag("delete_tag", False)
    with pytest.raises(FeatureFlagDisabled):
        repo.delete_tag("v1")

    repo.set_feature_flag("move_node", False)
    s = repo.writable_session("main")
    with pytest.raises(FeatureFlagDisabled):
        s.move("/a", "/b")


def test_ops_log_records_admin_actions(spark, repo):
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
    tip = repo.lookup_branch("main")
    repo.create_branch("dev", tip)
    repo.create_tag("v1", tip)
    repo.delete_branch("dev")
    repo.set_feature_flag("move_node", False)
    repo.garbage_collect(older_than_seconds=-1)

    kinds = [u.kind["type"] for u in repo.ops_log()]
    assert kinds == [
        "BranchCreated",
        "TagCreated",
        "BranchDeleted",
        "FeatureFlagChanged",
        "GarbageCollected",
    ]
    entries = list(repo.ops_log())
    assert entries[0].kind["name"] == "dev"
    assert entries[2].kind["previous_snap_id"] == tip
    assert all(u.updated_at > 0 for u in entries)
