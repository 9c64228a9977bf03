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
- v1 (current): ``format_version: 1`` with the metadata keys present.
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


_MIGRATIONS = {0: _v0_to_v1}

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
