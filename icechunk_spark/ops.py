"""Reference-parity operations-log types.

Mirrors icechunk-python/python/icechunk/ops.py: ``GCSummary``,
``Update`` and the ``UpdateType`` tagged union
(_icechunk_python.pyi:2190-2332).

The engine's ops log persists entries as JSON dicts
(``admin.Update.kind = {"type": ..., **fields}``); ``UpdateType.of``
lifts that dict into the reference-shaped typed variant so
``match update.kind_typed():`` works the way reference users expect.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

from icechunk_spark.repo.admin import Update
from icechunk_spark.repo.repository import GCSummary


class UpdateType:
    """Tagged union of ops-log operation types (reference parity:
    icechunk.UpdateType)."""

    @dataclass(frozen=True)
    class BranchCreated:
        name: str | None = None

    @dataclass(frozen=True)
    class BranchDeleted:
        name: str | None = None
        previous_snap_id: str | None = None

    @dataclass(frozen=True)
    class BranchReset:
        name: str | None = None
        previous_snap_id: str | None = None
        to_snap_id: str | None = None

    @dataclass(frozen=True)
    class CommitAmended:
        branch: str | None = None
        previous_snap_id: str | None = None
        new_snap_id: str | None = None

    @dataclass(frozen=True)
    class ConfigChanged:
        pass

    @dataclass(frozen=True)
    class ExpirationRan:
        pass

    @dataclass(frozen=True)
    class FeatureFlagChanged:
        id: int | None = None
        name: str | None = None
        new_value: bool | None = None
        setting: bool | None = None

    @dataclass(frozen=True)
    class GCRan:
        pass

    @dataclass(frozen=True)
    class MetadataChanged:
        pass

    @dataclass(frozen=True)
    class NewCommit:
        branch: str | None = None
        new_snap_id: str | None = None

    @dataclass(frozen=True)
    class NewDetachedSnapshot:
        new_snap_id: str | None = None

    @dataclass(frozen=True)
    class RepoInitialized:
        pass

    @dataclass(frozen=True)
    class RepoMigrated:
        from_version: int | None = None
        to_version: int | None = None

    @dataclass(frozen=True)
    class RepoStatusChanged:
        status: object | None = None
        availability: str | None = None

    @dataclass(frozen=True)
    class TagCreated:
        name: str | None = None

    @dataclass(frozen=True)
    class TagDeleted:
        name: str | None = None
        previous_snap_id: str | None = None

    @dataclass(frozen=True)
    class ManifestsRewritten:
        """Engine extension: manifest compaction ran (the reference
        folds this under maintenance; this engine logs it explicitly
        because rewrite_manifests is a first-class op here)."""

        branch: str | None = None

    # engine "type" string -> variant class
    _BY_TYPE = {}

    @classmethod
    def of(cls, kind: dict) -> object:
        """Lift an engine ops-log ``kind`` dict into its typed variant.
        Unknown types come back as the raw dict (forward compat —
        ops logs written by newer engines must still iterate)."""
        t = (kind or {}).get("type", "")
        variant = cls._BY_TYPE.get(t)
        if variant is None:
            return dict(kind or {})
        names = {f.name for f in fields(variant)}
        return variant(**{k: v for k, v in kind.items() if k in names})


# Keys are the engine's persisted "type" strings (repo/repository.py
# _log_update call sites), which already use the reference's variant
# names; a few engine-specific ops (SnapshotsExpired,
# GarbageCollected, ManifestsRewritten, StatusChanged) map onto their
# closest reference variant.
UpdateType._BY_TYPE = {
    "BranchCreated": UpdateType.BranchCreated,
    "BranchDeleted": UpdateType.BranchDeleted,
    "BranchReset": UpdateType.BranchReset,
    "CommitAmended": UpdateType.CommitAmended,
    "ConfigChanged": UpdateType.ConfigChanged,
    "SnapshotsExpired": UpdateType.ExpirationRan,
    "FeatureFlagChanged": UpdateType.FeatureFlagChanged,
    "GarbageCollected": UpdateType.GCRan,
    "MetadataChanged": UpdateType.MetadataChanged,
    "NewCommit": UpdateType.NewCommit,
    "NewDetachedSnapshot": UpdateType.NewDetachedSnapshot,
    "RepoInitialized": UpdateType.RepoInitialized,
    "RepoMigrated": UpdateType.RepoMigrated,
    "StatusChanged": UpdateType.RepoStatusChanged,
    "TagCreated": UpdateType.TagCreated,
    "TagDeleted": UpdateType.TagDeleted,
    "ManifestsRewritten": UpdateType.ManifestsRewritten,
}


def _kind_typed(self: Update) -> object:
    return UpdateType.of(self.kind)


# reference users read update.kind as the typed union; the engine keeps
# the dict (it round-trips JSON), so expose the typed view alongside
Update.kind_typed = property(_kind_typed)  # type: ignore[attr-defined]

__all__ = ["GCSummary", "Update", "UpdateType"]
