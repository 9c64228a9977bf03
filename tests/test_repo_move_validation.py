"""Session.move validation parity with the reference's move_node
(icechunk/src/session.rs:857-900, #2102 / reference Changelog 2.0.5):
moving a node into itself or its own descendant is rejected, as is
moving a node under an ARRAY path; valid moves still work and the
error precedence matches the reference (source-exists first, then
self/descendant, then overwrite, then array-parent)."""

from __future__ import annotations

import pytest

from icechunk_spark.repo import RefError, Repository


@pytest.fixture
def repo(spark, tmp_path):
    r = Repository.create(spark, str(tmp_path / "repo"))
    with r.transaction(message="init") as s:
        s.create_group("/g")
        s.create_group("/g/sub")
        s.create_array("/arr", shape=[4], chunk_shape=[2])
        s.create_group("/other")
    return r


def test_move_into_self_is_rejected(repo):
    with pytest.raises(RefError, match="into itself or its own descendant"):
        with repo.transaction(message="mv") as s:
            s.move("/g", "/g")


def test_move_into_own_descendant_is_rejected(repo):
    with pytest.raises(RefError, match="into itself or its own descendant"):
        with repo.transaction(message="mv") as s:
            s.move("/g", "/g/sub/deeper")


def test_move_to_sibling_prefix_is_not_self_referential(repo):
    # component-based check: /g2 does NOT start with component /g
    with repo.transaction(message="mv") as s:
        s.move("/g", "/g2")
    assert "/g2/sub" in repo.readonly_session().list_nodes()


def test_move_under_array_is_rejected(repo):
    with pytest.raises(RefError, match="is an array, not a group"):
        with repo.transaction(message="mv") as s:
            s.move("/other", "/arr/other")


def test_move_under_array_deep_is_rejected(repo):
    # the array may be any EXISTING ancestor, not just the immediate parent
    with pytest.raises(RefError, match="is an array, not a group"):
        with repo.transaction(message="mv") as s:
            s.move("/other", "/arr/a/b/other")


def test_move_missing_source_precedes_self_check(repo):
    with pytest.raises(RefError, match="no node at /nope"):
        with repo.transaction(message="mv") as s:
            s.move("/nope", "/nope/sub")


def test_move_wont_overwrite(repo):
    with pytest.raises(RefError, match="cannot overwrite existing node"):
        with repo.transaction(message="mv") as s:
            s.move("/g", "/other")


def test_valid_move_still_works_across_commits(repo):
    with repo.transaction(message="mv") as s:
        s.move("/g/sub", "/other/sub")
    nodes = repo.readonly_session().list_nodes()
    assert "/other/sub" in nodes and "/g/sub" not in nodes
