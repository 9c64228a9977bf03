"""Property-based change-set tests, mirroring the reference's
proptest strategies (icechunk/src/strategies.rs and the change-set
roundtrip properties): arbitrary sequences of chunk set/delete
operations grouped into commits must behave exactly like a dict
overlay — at EVERY historical snapshot, not just the tip.

Kept to few, small examples: each example spins real Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icechunk_spark.repo import Repository

KEYS = ["0.0", "0.1", "1.0", "1.1", "2.0"]

# one op: (key, payload-or-None); None = delete
op_st = st.tuples(
    st.sampled_from(KEYS),
    st.one_of(st.none(), st.binary(min_size=1, max_size=8)),
)
# a history: 1-3 commits of 1-4 ops each
history_st = st.lists(st.lists(op_st, min_size=1, max_size=4), min_size=1, max_size=3)


@pytest.fixture(scope="module")
def prop_root(spark, tmp_path_factory):
    return tmp_path_factory.mktemp("prop")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(history=history_st, data=st.data())
def test_commit_history_matches_dict_model(spark, tmp_path_factory, history, data):
    root = str(tmp_path_factory.mktemp("r"))
    repo = Repository.create(spark, root)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[24], chunk_shape=[8])

    model: dict[str, bytes] = {}
    snapshots: list[tuple[str, dict[str, bytes]]] = []
    for i, commit_ops in enumerate(history):
        s = repo.writable_session()
        for key, payload in commit_ops:
            if payload is None:
                s.delete_chunk("/a", key)
                model.pop(key, None)
            else:
                s.set_chunk_bytes("/a", key, payload)
                model[key] = payload
        snap = s.commit(f"c{i}")
        snapshots.append((snap, dict(model)))

    # every snapshot must read back exactly its model state
    for snap_id, expected in snapshots:
        sess = repo.readonly_session(snapshot_id=snap_id)
        for key in KEYS:
            assert sess.get_chunk_bytes("/a", key) == expected.get(key), (
                snap_id,
                key,
            )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(op_st, min_size=1, max_size=6))
def test_discard_changes_restores_base(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("r"))
    repo = Repository.create(spark, root)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[24], chunk_shape=[8])
        s.set_chunk_bytes("/a", "0.0", b"base")

    s = repo.writable_session()
    for key, payload in ops:
        if payload is None:
            s.delete_chunk("/a", key)
        else:
            s.set_chunk_bytes("/a", key, payload)
    s.discard_changes()
    assert not s.has_uncommitted_changes()
    assert s.get_chunk_bytes("/a", "0.0") == b"base"
    for key in KEYS[1:]:
        assert s.get_chunk_bytes("/a", key) is None
