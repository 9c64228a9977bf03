"""Model-based contract fuzz for Storage backends: every backend must
behave exactly like a dict under arbitrary interleavings of put /
conditional-put / delete / delete_prefix — in particular, a
conditional put succeeds iff the key is absent in the model, and
never clobbers an existing value (the CAS invariant branch commits
rest on).  Runs the same program against LocalFilesystemStorage,
InMemoryObjectStorage, and ArrowFsStorage(file://).
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from icechunk_spark.repo import (
    InMemoryObjectStorage,
    LocalFilesystemStorage,
    StorageConflict,
)
from icechunk_spark.repo.storage import ArrowFsStorage

KEYS = [f"refs/k{i}.json" for i in range(4)] + ["snapshots/s0.json", "snapshots/s1.json"]

op_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("put"), st.sampled_from(KEYS), st.binary(min_size=1, max_size=8)),
        st.tuples(st.just("cput"), st.sampled_from(KEYS), st.binary(min_size=1, max_size=8)),
        st.tuples(st.just("delete"), st.sampled_from(KEYS), st.just(b"")),
        st.tuples(st.just("delete_prefix"), st.sampled_from(["refs", "snapshots"]), st.just(b"")),
    ),
    min_size=1,
    max_size=25,
)


def _run_program(storage, ops):
    model: dict[str, bytes] = {}
    for op, key, data in ops:
        if op == "put":
            storage.put(key, data)
            model[key] = data
        elif op == "cput":
            if key in model:
                with pytest.raises(StorageConflict):
                    storage.put(key, data, if_none_match=True)
            else:
                storage.put(key, data, if_none_match=True)
                model[key] = data
        elif op == "delete":
            storage.delete(key)
            model.pop(key, None)
        elif op == "delete_prefix":
            storage.delete_prefix(key)
            model = {k: v for k, v in model.items() if not k.startswith(key + "/")}
        # full-state equivalence after every step
        for k in KEYS:
            if k in model:
                assert storage.exists(k), (op, k)
                assert storage.get(k) == model[k], (op, k)
            else:
                assert not storage.exists(k), (op, k)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=op_strategy)
def test_local_filesystem_matches_model(tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("stprop") / "r"
    _run_program(LocalFilesystemStorage(str(root)), ops)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=op_strategy)
def test_memory_object_store_matches_model(ops):
    bucket = f"p{uuid.uuid4().hex[:10]}"
    try:
        _run_program(InMemoryObjectStorage(bucket, "repo"), ops)
    finally:
        InMemoryObjectStorage.wipe_bucket(bucket)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=op_strategy)
def test_arrowfs_matches_model(tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("stprop") / "r"
    _run_program(ArrowFsStorage(f"file://{root}"), ops)
