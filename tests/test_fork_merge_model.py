"""Model-based fork/merge sequence test (extends the r14 conflict
model to the cooperative-write plane): K forks of one writable
session each apply a random bundle of chunk writes / creates /
resizes / deletes, the parent merges them in a RANDOM ORDER and
commits once — checked against a dict model folding the same bundles
in the same order under the documented contract (Session.merge:
"merge argument order wins on conflicting paths, matching the
chunk-overlap contract").

Predicts the final node table (presence + shape), the per-chunk
winner on the shared array (later-merged fork overrides on overlap),
and the winner-takes-all outcome when several forks create the SAME
fresh path with different node ids (the loser's chunks must not bleed
through the shared path).

Reference anchor: icechunk's Session.fork / merge cooperative-write
API (session.py fork/ForkSession); the executor-side pickling
roundtrip is covered separately by test_fork_executor_writes.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings

from tests.conftest import scaled_examples
from hypothesis import strategies as st

from icechunk_spark.repo import Repository

BASE_SHAPE = 8  # chunk_shape [2] -> chunk keys "0".."3"
CHUNKS = [0, 1, 2, 3]
FRESH = "/shared"
PAY = [b"\x00F0" * 1366, b"\x01F1" * 1366, b"\x02F2" * 1366]

# one fork's bundle: chunk writes to /x, optionally ONE node action
_fork_st = st.tuples(
    st.frozensets(st.sampled_from(CHUNKS), max_size=3),  # writes to /x
    st.sampled_from([None, "resize10", "resize4", "delete_x", "create_shared"]),
    st.frozensets(st.sampled_from(CHUNKS), max_size=2),  # writes to FRESH (if created)
)


def _apply_fork(fork, bundle, who: int):
    writes, action, fresh_writes = bundle
    for c in sorted(writes):
        fork.set_chunk_bytes("/x", str(c), PAY[who])
    if action == "resize10":
        fork.update_array("/x", shape=[10])
    elif action == "resize4":
        fork.update_array("/x", shape=[4])
    elif action == "delete_x":
        fork.delete_node("/x")
    elif action == "create_shared":
        fork.create_array(FRESH, shape=[BASE_SHAPE], chunk_shape=[2])
        for c in sorted(fresh_writes):
            fork.set_chunk_bytes(FRESH, str(c), PAY[who])


def _model_fold(bundles, order):
    """Fold the bundles in merge order; mirrors Session.merge's
    documented semantics."""
    x_present, x_shape = True, BASE_SHAPE
    x_owner: dict[int, int | None] = {c: None for c in CHUNKS}
    shared_winner: int | None = None
    for who in order:
        writes, action, _fresh = bundles[who]
        # chunk rows stage in merge order: later forks get higher seq,
        # so a later fork's write to the same chunk wins
        for c in writes:
            x_owner[c] = who
        if action == "resize10":
            x_present, x_shape = True, 10
        elif action == "resize4":
            x_present, x_shape = True, 4
        elif action == "delete_x":
            x_present = False
        elif action == "create_shared":
            shared_winner = who  # later create replaces the path entry
    return x_present, x_shape, x_owner, shared_winner


@settings(
    max_examples=scaled_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    bundles=st.tuples(_fork_st, _fork_st, _fork_st),
    order=st.permutations([0, 1, 2]),
)
def test_fork_merge_matches_model(spark, tmp_path_factory, bundles, order):
    root = str(tmp_path_factory.mktemp("forkmodel"))
    repo = Repository.create(spark, root)
    with repo.transaction(message="base") as s:
        s.create_array("/x", shape=[BASE_SHAPE], chunk_shape=[2])

    parent = repo.writable_session("main")
    forks = [parent.fork() for _ in range(3)]
    for who, (fork, bundle) in enumerate(zip(forks, bundles)):
        _apply_fork(fork, bundle, who)
    parent.merge(*[forks[i] for i in order])
    parent.commit("merged", allow_empty=True)

    x_present, x_shape, x_owner, shared_winner = _model_fold(bundles, order)

    sess = repo.readonly_session()
    nodes = sess.list_nodes()
    assert ("/x" in nodes) == x_present, (bundles, order)
    if x_present:
        assert sess.array_meta("/x").shape == [x_shape], (bundles, order)
        for c, who in x_owner.items():
            if 2 * c >= x_shape:
                continue  # beyond a shrunk shape: cropped
            got = sess.get_chunk_bytes("/x", str(c))
            assert got == (PAY[who] if who is not None else None), (c, bundles, order)

    if shared_winner is None:
        assert FRESH not in nodes
    else:
        assert FRESH in nodes
        win_writes = bundles[shared_winner][2]
        for c in CHUNKS:
            got = sess.get_chunk_bytes(FRESH, str(c))
            want = PAY[shared_winner] if c in win_writes else None
            assert got == want, (c, shared_winner, bundles, order)


def test_fork_metadata_isolation_and_discard(spark, tmp_path):
    """Directed pins for the two root-cause-shared bugs the model
    found (review r14): per-node dicts were shared between the base
    snapshot view, the parent, and every fork, so (1) a fork's
    update_array leaked into the parent and sibling forks instantly
    (wall-clock application order beat merge order), and (2)
    discard_changes could not undo a metadata update."""
    from icechunk_spark.repo import Repository

    repo = Repository.create(spark, str(tmp_path / "repo"))
    with repo.transaction(message="base") as s:
        s.create_array("/x", shape=[8], chunk_shape=[2], attrs={"k": "base"})

    # discard restores metadata updates
    s = repo.writable_session("main")
    s.update_array("/x", shape=[12])
    s.update_attrs("/x", {"k": "changed"})
    s.discard_changes()
    assert s.array_meta("/x").shape == [8]
    assert s.array_meta("/x").attrs == {"k": "base"}

    # forks are isolated until merge; merge ARGUMENT order wins
    p = repo.writable_session("main")
    f1, f2 = p.fork(), p.fork()
    f1.update_array("/x", shape=[10])
    f2.update_array("/x", shape=[4])
    assert p.array_meta("/x").shape == [8]
    assert f1.array_meta("/x").shape == [10]
    assert f2.array_meta("/x").shape == [4]
    p.merge(f2, f1)  # f1 merged LAST -> f1's metadata wins
    p.commit("merged")
    assert repo.readonly_session().array_meta("/x").shape == [10]
