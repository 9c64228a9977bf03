"""In-place spec-version migrations for repository layouts.

Reference parity: icechunk/src/migrations/mod.rs — a repo records the
spec version it was written with; an engine that understands a NEWER
spec can upgrade the layout in place (each step is idempotent and only
ever ADDS metadata, so a crashed migration re-runs safely), while a
repo written by a newer engine is refused rather than misread.

Versions here:
- v0: pre-spec repos — ``repo.json`` exists but carries no
  ``format_version`` (and possibly no metadata / default-commit-
  metadata keys).
- v1: ``format_version: 1`` with the metadata keys present; chunk
  files live FLAT under ``chunks/<id>.parquet``.
- v2 (current): chunk files are sharded as
  ``chunks/<2-hex>/<id>.parquet`` (format.chunk_rel) so GC can
  enumerate candidates shard-by-shard on executors instead of one
  driver-side LIST of every chunk file.  Existing flat files stay
  valid — manifests record explicit paths and v2 GC understands both
  layouts — but a v1 ENGINE must not open a v2 repo: its GC would
  treat shard dirs as unreferenced chunk files and delete live data,
  which is exactly what the version gate exists to prevent.
"""

from __future__ import annotations

from icechunk_spark.repo import format as fmt
from icechunk_spark.repo.format import RefError


def spec_version_of(root) -> int:
    """The spec version recorded at ``root`` (0 = pre-spec layout)."""
    return int(fmt.read_repo_info(root).get("format_version", 0))


def _v0_to_v1(root) -> None:
    """Stamp the spec version and guarantee the metadata keys the v1
    API contract reads unconditionally."""
    info = fmt.read_repo_info(root)
    info["format_version"] = 1
    info.setdefault("metadata", {})
    info.setdefault("default_commit_metadata", {})
    fmt.write_repo_info(root, info)


def _v1_to_v2(root) -> None:
    """Adopt the sharded chunk layout.  Purely a version stamp: new
    writes land sharded (format.chunk_rel), flat v1 files remain
    readable through their manifest-recorded paths, and v2 GC handles
    both — but v1 engines are locked out (see module docstring)."""
    info = fmt.read_repo_info(root)
    info["format_version"] = 2
    fmt.write_repo_info(root, info)


_MIGRATIONS = {0: _v0_to_v1, 1: _v1_to_v2}

CURRENT_SPEC_VERSION = max(_MIGRATIONS) + 1


def migrate_repository(root, *, dry_run: bool = False) -> list[int]:
    """Upgrade a repo layout to the current spec version, one step at a
    time; returns the list of from-versions applied (empty = already
    current).  Refuses layouts newer than this engine."""
    if not fmt.repo_exists(root):
        raise RefError(f"no repository at {root}")
    applied: list[int] = []
    v = spec_version_of(root)
    if v > CURRENT_SPEC_VERSION:
        raise RefError(
            f"repository spec version {v} is newer than this engine's "
            f"{CURRENT_SPEC_VERSION}; upgrade the engine instead"
        )
    while v < CURRENT_SPEC_VERSION:
        applied.append(v)
        if not dry_run:
            _MIGRATIONS[v](root)
            v = spec_version_of(root)
        else:
            v += 1
    return applied
