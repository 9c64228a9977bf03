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


# --- model-based sequence test (review r13 follow-through) ------------------
# The move-validation gap lived in exactly this plane: random sequences
# of tree ops where each op may legitimately FAIL.  The dict model must
# predict success/failure identically to the engine, and a predicted
# failure must leave the tree untouched.

from hypothesis import HealthCheck, given, settings

from tests.conftest import scaled_examples
from hypothesis import strategies as st

_PATHS = ["/a", "/a/b", "/a/b/c", "/g", "/g/x", "/h"]

_op_st = st.one_of(
    st.tuples(st.just("group"), st.sampled_from(_PATHS)),
    st.tuples(st.just("array"), st.sampled_from(_PATHS)),
    st.tuples(st.just("delete"), st.sampled_from(_PATHS)),
    st.tuples(st.just("move"), st.sampled_from(_PATHS), st.sampled_from(_PATHS)),
)


def _model_apply(nodes: dict, op) -> bool:
    """Mirror of the engine's documented semantics; True = succeeds."""
    kind = op[0]
    if kind in ("group", "array"):
        p = op[1]
        if p in nodes:
            return False
        nodes[p] = "group" if kind == "group" else "array"
        return True
    if kind == "delete":
        p = op[1]
        doomed = [q for q in nodes if q == p or q.startswith(p + "/")]
        if not doomed:
            return False
        for q in doomed:
            del nodes[q]
        return True
    _, src, dst = op
    moved = [p for p in nodes if p == src or p.startswith(src + "/")]
    if not moved:
        return False
    if dst == src or dst.startswith(src + "/"):
        return False
    if dst in nodes:
        return False
    anc = dst.rsplit("/", 1)[0]
    while anc:
        if nodes.get(anc) == "array":
            return False
        anc = anc.rsplit("/", 1)[0]
    for p in moved:
        nodes[dst + p[len(src):]] = nodes.pop(p)
    return True


@settings(
    max_examples=scaled_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op_st, min_size=1, max_size=12))
def test_tree_ops_match_dict_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("treeprop"))
    r = Repository.create(spark, root)
    model: dict[str, str] = {"/": "group"}
    s = r.writable_session("main")
    for op in ops:
        expect_ok = _model_apply(model, op)
        try:
            if op[0] == "group":
                s.create_group(op[1])
            elif op[0] == "array":
                s.create_array(op[1], shape=[4], chunk_shape=[2])
            elif op[0] == "delete":
                s.delete_node(op[1])
            else:
                s.move(op[1], op[2])
            ok = True
        except RefError:
            ok = False
        assert ok == expect_ok, (op, model)
        assert s.list_nodes() == model, (op,)
    # an all-failures sequence legitimately has nothing to commit
    s.commit("seq", allow_empty=True)
    assert r.readonly_session().list_nodes() == model


def test_strict_mode_requires_destination_parent(repo):
    """ADVICE r13: opt-in reference parity for move_node's
    MoveDestinationParentMissing — by default this tree's
    implicit-parent model lets `move('/x', '/ghost/x')` succeed, but
    ``require_parent=True`` demands the destination's immediate
    parent group already exist."""
    with pytest.raises(RefError, match="does not exist"):
        with repo.transaction(message="mv") as s:
            s.move("/other", "/ghost/other", require_parent=True)
    # existing parent group: strict mode passes
    with repo.transaction(message="mv") as s:
        s.move("/other", "/g/other", require_parent=True)
    # root-level destination always has a parent
    with repo.transaction(message="mv") as s:
        s.move("/g/other", "/other2", require_parent=True)
    # default (implicit-parent) mode still allows the ghost parent
    with repo.transaction(message="mv") as s:
        s.move("/other2", "/ghost/other", require_parent=False)
    assert "/ghost/other" in repo.readonly_session("main").list_nodes()
