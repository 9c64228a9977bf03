"""Reference-parity exception surface.

Mirrors the public error names of icechunk
(icechunk-python/python/icechunk/_exceptions.py and the
``IcechunkError`` family in _icechunk_python.pyi:3611+): a single
:class:`IcechunkError` base carrying ``message`` + a stable
machine-readable ``kind`` code (:class:`ErrorKind`), with one subclass
per user-facing failure mode.

The engine's core exceptions are defined at their home modules and
already derive from the shared base (``repo/errbase.py``):
``format.RefError``, ``session.ConflictError`` (= the reference's
``RebaseFailedError``: it carries the structured conflict list),
``storage.StorageConflict`` / ``storage.CASUnsupported``.  This module
adds the remaining reference names so ``except IcechunkError`` and
``except NotFoundError`` behave exactly as a reference user expects.
"""

from __future__ import annotations

from icechunk_spark.repo.errbase import ErrorKind, IcechunkError
from icechunk_spark.repo.format import RefError
from icechunk_spark.repo.session import ConflictError
from icechunk_spark.repo.storage import CASUnsupported, StorageConflict


class AlreadyExistsError(IcechunkError):
    default_kind = ErrorKind.ALREADY_EXISTS.value


class FormatError(IcechunkError):
    default_kind = ErrorKind.FORMAT.value


class InternalError(IcechunkError):
    default_kind = ErrorKind.INTERNAL.value


class InvalidInputError(IcechunkError, ValueError):
    default_kind = ErrorKind.INVALID_INPUT.value


class NotFoundError(IcechunkError):
    default_kind = ErrorKind.NOT_FOUND.value


class NodeNotFoundError(NotFoundError):
    default_kind = ErrorKind.NODE_NOT_FOUND.value


class RepositoryNotFoundError(NotFoundError):
    default_kind = ErrorKind.REPOSITORY_NOT_FOUND.value


class SnapshotNotFoundError(NotFoundError):
    default_kind = ErrorKind.SNAPSHOT_NOT_FOUND.value


class ReadOnlyError(IcechunkError):
    default_kind = ErrorKind.READ_ONLY.value


class SessionStateError(IcechunkError):
    default_kind = ErrorKind.SESSION_STATE.value


class StorageError(IcechunkError):
    default_kind = ErrorKind.STORAGE.value


# The reference distinguishes RefNotFoundError from the general ref
# error; the engine's RefError already carries ref-not-found semantics
# (kind = ref_not_found) — export it under both names.
RefNotFoundError = RefError

# Rebase failures carry the structured conflict list (reference:
# RebaseFailedError(ConflictError) — _icechunk_python.pyi:3750+); the
# engine's ConflictError is exactly that object.
RebaseFailedError = ConflictError

__all__ = [
    "AlreadyExistsError",
    "CASUnsupported",
    "ConflictError",
    "ErrorKind",
    "FormatError",
    "IcechunkError",
    "InternalError",
    "InvalidInputError",
    "NodeNotFoundError",
    "NotFoundError",
    "ReadOnlyError",
    "RebaseFailedError",
    "RefNotFoundError",
    "RepositoryNotFoundError",
    "SessionStateError",
    "SnapshotNotFoundError",
    "StorageConflict",
    "StorageError",
]
