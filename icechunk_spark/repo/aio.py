"""Async API surface: ``*_async`` twins of the Repository / Session /
ChunkStore methods (reference parity: icechunk-python repository.py:157,
:262, :453, :1052 ..., session.py:182-659, store.py:116-671 — the
reference exposes an async variant of nearly every method so async
frameworks — e.g. a FastAPI service fronting a repo — never block the
event loop on object-store IO).

The reference's async methods await a Rust tokio runtime.  This
rebuild's equivalent is ``asyncio.to_thread``: every sync method is
already thread-safe for the read paths (pyarrow fs + local caches) and
the GIL releases during IO, so a thread-pool hop gives the same
property the reference provides — the event loop stays responsive
while storage IO runs.  Each twin awaits to exactly the sync twin's
result (asserted method-by-method in tests/test_async_api.py).

Naming deltas from the reference, by necessity:

- zarr's Store ABC makes ``get``/``set``/``exists``/... natively async
  with NO suffix (reference store.py:148, :221).  This rebuild's
  ChunkStore facade already uses those names for the sync surface, so
  the async twins take the ``_async`` suffix consistently.
- reference ``Session.chunk_coordinates`` (session.py:327) is
  async-only; here the sync generator owns the plain name and the
  async generator is ``chunk_coordinates_async``.

Generator-returning methods (``ops_log``, ``chunk_coordinates``) get
genuine async *generators* (the ``async_ancestry`` pattern,
repository.py:836): each ``next()`` hops to a thread, so an
``async for`` never blocks the loop between elements.
"""

from __future__ import annotations

import asyncio
import functools
from collections.abc import AsyncIterator


class AsyncCloseableIterator:
    """Async iterator with a deterministic ``aclose()`` (reference
    parity: icechunk-python #2240, Changelog 2.1.0 — the objects
    returned by the async iteration APIs are typed async ITERATORS,
    not generators: no ``asend``/``athrow``, but ``aclose()`` so
    ``contextlib.aclosing(...)`` and early-exit cleanup work).

    Wraps a zero-arg factory producing the sync iterator; the factory
    runs lazily in a worker thread on first ``__anext__`` (so merely
    constructing the twin never blocks the loop), each ``next()`` hops
    to a thread (the async_ancestry pattern), and ``aclose()``
    ``close()``s the underlying sync generator in a thread — its
    ``finally`` blocks run deterministically instead of at GC.  After
    ``aclose()``, ``__anext__`` raises ``StopAsyncIteration`` (the
    closed-generator contract); ``aclose()`` is idempotent."""

    _SENTINEL = object()

    def __init__(self, make_sync_iter):
        self._make = make_sync_iter
        self._it = None
        self._closed = False

    def __aiter__(self) -> AsyncCloseableIterator:
        return self

    async def __anext__(self):
        if self._closed:
            raise StopAsyncIteration
        if self._it is None:
            self._it = iter(await asyncio.to_thread(self._make))
        item = await asyncio.to_thread(next, self._it, self._SENTINEL)
        if item is self._SENTINEL:
            self._closed = True
            raise StopAsyncIteration
        return item

    async def aclose(self) -> None:
        if self._closed:
            return
        self._closed = True
        it, self._it = self._it, None
        close = getattr(it, "close", None)
        if close is not None:
            await asyncio.to_thread(close)

    def __class_getitem__(cls, item):
        return cls


def _static_wrapper(func, name: str):
    @functools.wraps(func)
    async def twin(*args, **kwargs):
        return await asyncio.to_thread(func, *args, **kwargs)

    twin.__name__ = name
    twin.__qualname__ = name
    twin.__doc__ = (
        f"Async twin of ``{func.__name__}`` (reference parity: the "
        f"``*_async`` surface).  Runs the sync method in a worker "
        f"thread and awaits to the identical result."
    )
    return twin


def _call_wrapper(sync_name: str, name: str, *, locked: bool = False):
    # dynamic dispatch via getattr(self, ...) so subclass overrides
    # (e.g. ForkSession.commit) are honored by the twin.
    #
    # locked=True (the WRITE twins): two concurrently awaited write
    # twins on one session would interleave its _staged/_chunk_buffer
    # mutations nondeterministically (the sync surface is documented
    # single-writer; ADVICE r7).  A per-SESSION threading.Lock held
    # inside the worker thread serializes them — ChunkStore twins lock
    # the underlying session, so store and session writes serialize
    # against each other too.
    async def twin(self, *args, **kwargs):
        if locked:
            import threading

            owner = getattr(self, "session", self)
            def call():
                lock = owner.__dict__.setdefault(
                    "_async_write_lock", threading.Lock()
                )
                with lock:
                    return getattr(self, sync_name)(*args, **kwargs)

            return await asyncio.to_thread(call)
        return await asyncio.to_thread(getattr(self, sync_name), *args, **kwargs)

    twin.__name__ = name
    twin.__qualname__ = name
    twin.__doc__ = (
        f"Async twin of ``{sync_name}`` (reference parity: the "
        f"``*_async`` surface).  Runs the sync method in a worker "
        f"thread and awaits to the identical result."
    )
    return twin


def _gen_wrapper(sync_name: str, name: str):
    def twin(self, *args, **kwargs) -> AsyncIterator:
        return AsyncCloseableIterator(
            lambda: getattr(self, sync_name)(*args, **kwargs)
        )

    twin.__name__ = name
    twin.__qualname__ = name
    twin.__doc__ = (
        f"Async-iterator twin of ``{sync_name}``: ``async for`` pulls "
        f"each element via a worker thread (the async_ancestry "
        f"pattern); returns an AsyncCloseableIterator whose "
        f"``aclose()`` closes the underlying sync iterator (#2240)."
    )
    return twin


# method name -> kind; "call" = awaitable returning the sync result,
# "gen" = async generator, "static" / "class" = lifecycle helpers
# callable on the class itself.
REPOSITORY_ASYNC: dict[str, str] = {
    # lifecycle (reference repository.py:157, :262, :372, :453, :501, :554)
    "create": "class",
    "open": "class",
    "open_or_create": "class",
    "exists": "static",
    "fetch_spec_version": "static",
    "fetch_config": "static",
    "save_config": "call",
    "reopen": "call",
    # repo metadata (:735, :759, :785)
    "get_metadata": "call",
    "set_metadata": "call",
    "update_metadata": "call",
    # status / flags (:821, :843, :865, :887, :909, :933)
    "get_status": "call",
    "set_status": "call",
    "feature_flags": "call",
    "enabled_feature_flags": "call",
    "disabled_feature_flags": "call",
    "set_feature_flag": "call",
    # history (:1052, :1079)
    "ancestry_graph": "call",
    "ops_log": "gen",
    # refs (:1104-:1417)
    "create_branch": "call",
    "list_branches": "call",
    "lookup_branch": "call",
    "lookup_snapshot": "call",
    "list_manifest_files": "call",
    "reset_branch": "call",
    "delete_branch": "call",
    "delete_tag": "call",
    "create_tag": "call",
    "list_tags": "call",
    "lookup_tag": "call",
    # diff / sessions (:1465, :1539, :1602, :1647)
    "diff": "call",
    "readonly_session": "call",
    "writable_session": "call",
    "rearrange_session": "call",
    # maintenance (:1767, :1861, :1950, :2030, :2106)
    "expire_snapshots": "call",
    "rewrite_manifests": "call",
    "garbage_collect": "call",
    "chunk_storage_stats": "call",
    "total_chunks_storage": "call",
    # inspection (:2176, :2224, :2274, :2339)
    "inspect_snapshot": "call",
    "inspect_repo_info": "call",
    "inspect_manifest": "call",
    "inspect_transaction_log": "call",
}

SESSION_ASYNC: dict[str, str] = {
    # reference session.py:182, :212, :316, :327, :365, :399, :460,
    # :549, :614, :659
    "move": "wcall",
    "get_node_id": "call",
    "all_virtual_chunk_locations": "call",
    "chunk_coordinates": "gen",
    "chunk_type": "call",
    "merge": "wcall",
    "commit": "wcall",
    "amend": "wcall",
    "flush": "wcall",
    "rebase": "wcall",
}

STORE_ASYNC: dict[str, str] = {
    # reference store.py:116-:671 (zarr-native async surface) +
    # :331, :391, :491 (virtual-ref *_async)
    "clear": "wcall",
    "is_empty": "call",
    "get": "call",
    "get_partial_values": "call",
    "exists": "call",
    "set": "wcall",
    "set_if_not_exists": "wcall",
    "set_virtual_ref": "wcall",
    "set_virtual_refs": "wcall",
    "set_virtual_refs_arr": "wcall",
    "delete": "wcall",
    "delete_dir": "wcall",
    "set_partial_values": "wcall",
    "getsize": "call",
    "getsize_prefix": "call",
    # the #2240 iteration surfaces (reference store.py: list/
    # list_prefix/list_dir/array_chunk_iterator are natively async
    # there and return AsyncCloseableIterator; here the sync surface
    # owns the names, so the closeable async twins take _async)
    "list": "gen",
    "list_prefix": "gen",
    "list_dir": "gen",
    "array_chunk_iterator": "gen",
}


def install_async_twins(cls, spec: dict[str, str]) -> None:
    """Attach ``<name>_async`` twins to ``cls`` per the spec.  Skips a
    name if the class already defines the twin by hand (e.g.
    ``Repository.async_ancestry``) so hand-tuned variants win."""
    for name, kind in spec.items():
        twin_name = f"{name}_async"
        if any(twin_name in k.__dict__ for k in cls.__mro__):
            continue
        assert any(name in k.__dict__ for k in cls.__mro__), name
        if kind in ("static", "class"):
            # resolve the descriptor to a class-bound callable so the
            # twin is callable straight off the class, like the
            # reference's create_async/open_async
            bound = getattr(cls, name)
            setattr(cls, twin_name, staticmethod(_static_wrapper(bound, twin_name)))
        elif kind == "gen":
            setattr(cls, twin_name, _gen_wrapper(name, twin_name))
        elif kind == "wcall":
            setattr(cls, twin_name, _call_wrapper(name, twin_name, locked=True))
        else:
            setattr(cls, twin_name, _call_wrapper(name, twin_name))
