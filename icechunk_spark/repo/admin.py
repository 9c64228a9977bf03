"""Administrative plane: repo status, feature flags, and the ops log.

Reference parity:
- RepoStatus / RepoAvailability — icechunk-python _icechunk_python.pyi
  (RepoAvailability.online/read_only), Repository.get_status/set_status
  (repository.py:798-851).
- Feature flags — icechunk/src/feature_flags.rs: a static registry of
  (name, id, default); user settings (True/False/None=default) stored
  in repo info; guarded operations raise when their flag is disabled.
- ops_log — Repository.ops_log (repository.py:1067): a summary of
  administrative changes (branch/tag lifecycle, status and flag
  changes, maintenance runs), each an ``Update`` with a kind tag and
  timestamp, persisted as write-once objects so concurrent admins
  never clobber each other.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any


class RepoAvailability(IntEnum):
    online = 0
    read_only = 1


@dataclass
class RepoStatus:
    availability: RepoAvailability
    set_at: float | None = None
    limited_availability_reason: str | None = None

    def __post_init__(self) -> None:
        if self.set_at is None:
            self.set_at = time.time()
        if isinstance(self.availability, str):
            self.availability = RepoAvailability[self.availability]
        else:
            self.availability = RepoAvailability(self.availability)

    def to_dict(self) -> dict[str, Any]:
        return {
            "availability": self.availability.name,
            "set_at": self.set_at,
            "limited_availability_reason": self.limited_availability_reason,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RepoStatus":
        return cls(
            availability=d["availability"],
            set_at=d.get("set_at"),
            limited_availability_reason=d.get("limited_availability_reason"),
        )


@dataclass
class FeatureFlag:
    id: int
    name: str
    default: bool
    setting: bool | None = None

    @property
    def enabled(self) -> bool:
        return self.default if self.setting is None else self.setting

    @property
    def in_default_state(self) -> bool:
        return self.setting is None


# (name -> (id, default_enabled)); ids 1-2 reserved, mirroring
# icechunk/src/feature_flags.rs
FEATURE_FLAGS: dict[str, tuple[int, bool]] = {
    "move_node": (3, True),
    "create_tag": (4, True),
    "delete_tag": (5, True),
}


class FeatureFlagDisabled(Exception):
    pass


def check_flag(settings: dict[str, bool], name: str, feature_description: str) -> None:
    if name not in FEATURE_FLAGS:
        raise KeyError(f"unknown feature flag {name!r}")
    _, default = FEATURE_FLAGS[name]
    if not settings.get(name, default):
        raise FeatureFlagDisabled(
            f"{feature_description} is disabled by feature flag {name!r}"
        )


@dataclass
class Update:
    """One ops-log entry."""

    kind: dict[str, Any]  # tagged union: {"type": ..., **fields}
    updated_at: float = field(default_factory=time.time)
    backup_path: str | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "kind": self.kind,
            "updated_at": self.updated_at,
            "backup_path": self.backup_path,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Update":
        return cls(
            kind=d["kind"],
            updated_at=d["updated_at"],
            backup_path=d.get("backup_path"),
        )
