"""Dependency-free base of the engine's exception hierarchy.

Lives below ``repo/format.py`` / ``repo/session.py`` / ``repo/storage.py``
so their exception classes can inherit :class:`IcechunkError` without an
import cycle; the full reference-parity surface (subclass-per-failure-
mode, ``ErrorKind`` codes) is assembled in ``icechunk_spark/errors.py``.

Reference parity: icechunk.IcechunkError / icechunk.ErrorKind
(icechunk-python _icechunk_python.pyi:3611+) — a single base carrying a
human ``message`` plus a stable machine-readable ``kind`` code.
"""

from __future__ import annotations

from enum import Enum


class ErrorKind(str, Enum):
    """Stable machine-readable error codes (reference: icechunk.ErrorKind)."""

    ALREADY_EXISTS = "already_exists"
    CONFLICT = "conflict"
    FORMAT = "format"
    INTERNAL = "internal"
    INVALID_INPUT = "invalid_input"
    NODE_NOT_FOUND = "node_not_found"
    NOT_FOUND = "not_found"
    READ_ONLY = "read_only"
    REBASE_FAILED = "rebase_failed"
    REF_NOT_FOUND = "ref_not_found"
    REPOSITORY_NOT_FOUND = "repository_not_found"
    SESSION_STATE = "session_state"
    SNAPSHOT_NOT_FOUND = "snapshot_not_found"
    STORAGE = "storage"


class IcechunkError(Exception):
    """Base class for all errors raised by the engine
    (reference parity: icechunk.IcechunkError)."""

    default_kind: str = ErrorKind.INTERNAL.value

    _NOTE_PREFIX = "icechunk diagnostic: "

    def __init__(self, *args: object) -> None:
        super().__init__(*args)
        # Reference parity #2267: the diagnostic report travels as a
        # PEP 678 note, so tracebacks show the stable kind code and
        # the concrete class without the catcher doing anything.
        self._refresh_diagnostic_note()

    def _refresh_diagnostic_note(self) -> None:
        """(Re)write the PEP 678 diagnostic note so it always reflects
        the CURRENT kind — several raise sites override ``_kind`` after
        construction, and a note baked at ``__init__`` time would report
        the wrong code for those."""
        try:
            note = f"{self._NOTE_PREFIX}kind={self.kind} type={type(self).__name__}"
            notes = getattr(self, "__notes__", None)
            if notes:
                for i, n in enumerate(notes):
                    if isinstance(n, str) and n.startswith(self._NOTE_PREFIX):
                        notes[i] = note
                        return
            self.add_note(note)
        except Exception:  # pragma: no cover - note attach is best-effort
            pass

    @property
    def message(self) -> str:
        return getattr(self, "_message", None) or str(self)

    @property
    def kind(self) -> str:
        """Stable machine-readable error code, see :class:`ErrorKind`."""
        return self.__dict__.get("_kind") or type(self).default_kind

    @property
    def _kind(self) -> str | None:
        return self.__dict__.get("_kind")

    @_kind.setter
    def _kind(self, value: str) -> None:
        # Raise sites narrow the kind post-construction
        # (session.py:162/1451/1593); keep the diagnostic note in sync.
        self.__dict__["_kind"] = value
        self._refresh_diagnostic_note()
