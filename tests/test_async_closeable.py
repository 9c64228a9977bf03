"""AsyncCloseableIterator parity (reference icechunk-python #2240,
Changelog 2.1.0): the async iteration APIs — Store.list/list_prefix/
list_dir/array_chunk_iterator (_async twins here), Repository.
async_ancestry/ops_log_async, Session.chunk_coordinates_async —
return a typed async ITERATOR (no asend/athrow) with an ``aclose()``
so ``contextlib.aclosing(...)`` and deterministic early-exit cleanup
work.  No pytest-asyncio in the container: each test drives its own
``asyncio.run``.
"""

from __future__ import annotations

import asyncio
from contextlib import aclosing

import pytest

from icechunk_spark.repo import Repository
from icechunk_spark.repo.aio import AsyncCloseableIterator
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


def test_unit_aclose_closes_underlying_sync_generator():
    """The contract itself, on a sync generator with a finally: early
    exit via aclose() runs the generator's cleanup deterministically
    (not at GC), iteration after aclose raises StopAsyncIteration,
    and aclose is idempotent."""
    closed = []

    def gen():
        try:
            yield from range(100)
        finally:
            closed.append(True)

    async def flow():
        it = AsyncCloseableIterator(gen)
        assert it.__aiter__() is it
        assert await it.__anext__() == 0
        assert await it.__anext__() == 1
        assert not closed
        await it.aclose()
        assert closed == [True]
        with pytest.raises(StopAsyncIteration):
            await it.__anext__()
        await it.aclose()  # idempotent
        assert closed == [True]

    run(flow())


def test_unit_aclose_before_first_anext_never_builds_the_iterator():
    built = []

    async def flow():
        it = AsyncCloseableIterator(lambda: built.append(True) or iter(()))
        await it.aclose()
        assert not built
        with pytest.raises(StopAsyncIteration):
            await it.__anext__()

    run(flow())


def test_unit_exhaustion_and_not_a_generator():
    """Natural exhaustion raises StopAsyncIteration; the object is an
    async iterator, NOT a generator — no asend/athrow (the reference
    pyi pins exactly __aiter__/__anext__/aclose)."""

    async def flow():
        it = AsyncCloseableIterator(lambda: iter([7]))
        assert [x async for x in it] == [7]
        with pytest.raises(StopAsyncIteration):
            await it.__anext__()

    run(flow())
    assert not hasattr(AsyncCloseableIterator, "asend")
    assert not hasattr(AsyncCloseableIterator, "athrow")
    # generic subscription works like the reference's __class_getitem__
    assert AsyncCloseableIterator[str] is AsyncCloseableIterator


def test_every_iteration_surface_returns_closeable(repo):
    """All #2240 surfaces return AsyncCloseableIterator and agree
    with their sync twins."""
    store = ChunkStore(repo.readonly_session(branch="main"))

    async def flow():
        surfaces = [
            (repo.async_ancestry(branch="main"), [s.id for s in repo.ancestry(branch="main")], lambda s: s.id),
            (repo.ops_log_async(), list(repo.ops_log()), None),
            (store.list_async(), sorted(store.list()), None),
            (store.list_prefix_async("a/"), sorted(store.list_prefix("a/")), None),
            (store.list_dir_async(""), sorted(store.list_dir("")), None),
            (
                store.session.chunk_coordinates_async("/a"),
                list(store.session.chunk_coordinates("/a")),
                None,
            ),
        ]
        for it, expect, key in surfaces:
            assert isinstance(it, AsyncCloseableIterator), it
            got = [x async for x in it]
            if key is not None:
                got = [key(x) for x in got]
            if isinstance(expect, list) and expect and not key:
                got = sorted(got) if got and isinstance(got[0], str) else got
            assert got == expect

    run(flow())


def test_aclosing_early_exit_on_ancestry(spark, tmp_path):
    """contextlib.aclosing + break mid-history: the loop stops after
    one element and cleanup is deterministic (no unawaited-generator
    warnings, iterator closed)."""
    r = Repository.create(spark, str(tmp_path / "r2"))
    for i in range(3):
        with r.transaction(message=f"c{i}") as s:
            s.update_group_attrs("/", {"i": i})

    async def flow():
        seen = []
        it = r.async_ancestry(branch="main")
        async with aclosing(it) as hist:
            async for snap in hist:
                seen.append(snap.id)
                break
        assert len(seen) == 1
        with pytest.raises(StopAsyncIteration):
            await it.__anext__()

    run(flow())
