"""Distributed-write glue helpers (reference parity:
icechunk-python/python/icechunk/distributed.py:33 ``extract_session``
and :56 ``merge_sessions``).

The reference exposes these as free functions because dask/xarray
reduction trees call them by name.  This rebuild's cooperative
multi-writer mechanism is ``Session.fork()`` → executor-side writes →
``Session.merge(*forks)`` (repo/session.py:1799); these helpers give
that mechanism the reference-shaped, discoverable names so a reference
user's distributed-write recipe ports unchanged.
"""

from __future__ import annotations

from collections.abc import Generator, Iterable
from typing import Any

from icechunk_spark.repo.session import ForkSession, Session


__all__ = ["extract_session", "merge_sessions"]


def _flatten(seq: Iterable[Any]) -> Generator[Any, None, None]:
    for item in seq:
        if isinstance(item, (list, tuple)):
            yield from _flatten(item)
        else:
            yield item


def extract_session(obj: Any, axis: Any = None, keepdims: Any = None) -> Session:
    """The Session behind a store-like object (reference
    distributed.py:33 — there, a ``zarr.Array``; here, a ``ChunkStore``
    facade or anything else carrying a ``.session``).  ``axis`` /
    ``keepdims`` are accepted and ignored so the function slots into
    reduction-tree callbacks unchanged."""
    del axis, keepdims
    if isinstance(obj, Session):
        return obj
    session = getattr(obj, "session", None)
    if isinstance(session, Session):
        return session
    raise TypeError(
        f"cannot extract a Session from {type(obj).__name__!r}; pass a "
        "ChunkStore (or any object with a .session) or a Session"
    )


def merge_sessions(
    *sessions: "ForkSession | list[ForkSession] | list[list[ForkSession]]",
) -> ForkSession:
    """Merge ForkSessions into the first and return it (reference
    distributed.py:56, including its arbitrarily-nested-list contract
    for reduction frameworks).  Only ForkSessions are accepted — to
    fold forks into the parent writable session, use
    ``Session.merge(*forks)``."""
    flat = list(_flatten(sessions))
    if not flat:
        raise TypeError("merge_sessions needs at least one ForkSession")
    for s in flat:
        if not isinstance(s, ForkSession):
            raise TypeError(
                "merge_sessions only accepts ForkSession objects. "
                f"Received {type(s).__name__!r} instance instead. "
                "To merge _all_ your sessions, use "
                "`Session.merge(*forked_sessions)` instead."
            )
    head, *rest = flat
    head.merge(*rest)
    return head
