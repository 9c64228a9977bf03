"""Reference-parity conflict-resolution surface.

Mirrors icechunk-python/python/icechunk/conflicts.py and the types in
_icechunk_python.pyi:3542-3750: :class:`VersionSelection`,
:class:`BasicConflictSolver`, :class:`ConflictDetector`,
:class:`ConflictType` and :class:`Conflict`.

The engine's rebase (repo/session.py:_rebase_onto) already detects the
full conflict taxonomy and resolves via a
``ConflictSolver(on_chunk_conflict=..., on_node_conflict=...)`` policy
object; the classes here are the reference-shaped constructors for that
same policy, so a reference user can write

    session.rebase(BasicConflictSolver(on_chunk_conflict=VersionSelection.UseOurs))

unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from icechunk_spark.repo.session import ConflictError, ConflictSolver


class VersionSelection(Enum):
    """Which side wins a conflicted change during rebase
    (reference: icechunk.VersionSelection)."""

    Fail = 0
    UseOurs = 1
    UseTheirs = 2


_MODE = {
    VersionSelection.Fail: "fail",
    VersionSelection.UseOurs: "use_ours",
    VersionSelection.UseTheirs: "use_theirs",
}


class BasicConflictSolver(ConflictSolver):
    """Simple configurable resolution (reference: BasicConflictSolver).

    - chunk/chunk conflicts resolve per ``on_chunk_conflict``
    - node-level conflicts (delete-of-updated array/group, double
      metadata update, …) resolve in favor of OUR session unless the
      matching ``fail_on_delete_of_updated_*`` flag demands a failure
      (the reference's default is also not-failing).
    """

    def __init__(
        self,
        *,
        on_chunk_conflict: VersionSelection = VersionSelection.UseOurs,
        fail_on_delete_of_updated_array: bool = False,
        fail_on_delete_of_updated_group: bool = False,
    ):
        # each flag fails ONLY its own conflict kinds (reference
        # semantics) — other node conflicts still resolve use_ours
        fail_kinds: list[str] = []
        if fail_on_delete_of_updated_array:
            # both directions of the array-delete/write race
            fail_kinds += ["delete_of_written", "deleted_node_write"]
        if fail_on_delete_of_updated_group:
            # new node created under a group the other side deleted
            fail_kinds += ["invalid_group"]
        super().__init__(
            on_chunk_conflict=_MODE[on_chunk_conflict],
            on_node_conflict="use_ours",
            fail_node_kinds=tuple(fail_kinds),
        )
        self.fail_on_delete_of_updated_array = fail_on_delete_of_updated_array
        self.fail_on_delete_of_updated_group = fail_on_delete_of_updated_group


class ConflictDetector(ConflictSolver):
    """Detect-only solver (reference: ConflictDetector): rebase raises
    a :class:`~icechunk_spark.errors.RebaseFailedError` listing every
    conflict instead of resolving anything, so the operation can be
    retried with a different strategy."""

    def __init__(self) -> None:
        super().__init__(on_chunk_conflict="fail", on_node_conflict="fail")


class ConflictType(Enum):
    """Type of conflict detected (reference: icechunk.ConflictType)."""

    NewNodeConflictsWithExistingNode = 1
    NewNodeInInvalidGroup = 2
    ZarrMetadataDoubleUpdate = 3
    ZarrMetadataUpdateOfDeletedArray = 4
    ZarrMetadataUpdateOfDeletedGroup = 5
    ChunkDoubleUpdate = 6
    ChunksUpdatedInDeletedArray = 7
    ChunksUpdatedInUpdatedArray = 8
    DeleteOfUpdatedArray = 9
    DeleteOfUpdatedGroup = 10
    MoveOperationCannotBeRebased = 11


# engine conflict-record "kind" -> reference ConflictType
_KIND_TO_TYPE = {
    "chunk": ConflictType.ChunkDoubleUpdate,
    "node": ConflictType.ZarrMetadataDoubleUpdate,
    "path": ConflictType.NewNodeConflictsWithExistingNode,
    "deleted_node_write": ConflictType.ChunksUpdatedInDeletedArray,
    "delete_of_written": ConflictType.DeleteOfUpdatedArray,
    "updated_node_write": ConflictType.ChunksUpdatedInUpdatedArray,
    "invalid_group": ConflictType.NewNodeInInvalidGroup,
}


@dataclass(frozen=True)
class Conflict:
    """A single conflict between two snapshots
    (reference: icechunk.Conflict)."""

    conflict_type: ConflictType
    path: str
    conflicted_chunks: list[list[int]] | None = None


def conflicts_of(err: ConflictError) -> list[Conflict]:
    """Convert a :class:`ConflictError`'s structured records into
    reference-shaped :class:`Conflict` objects.  Chunk conflicts on the
    same node are folded into one Conflict whose ``conflicted_chunks``
    lists the grid coordinates (parsed from the ``c/i/j/..`` chunk key,
    matching the reference's list-of-index-vectors shape)."""
    chunk_by_node: dict[str, list[list[int]]] = {}
    out: list[Conflict] = []
    for rec in err.conflicts:
        kind = rec.get("kind", "")
        if kind == "chunk":
            key = rec.get("chunk_key", "")
            parts = [p for p in key.split("/") if p not in ("", "c")]
            try:
                coords = [int(p) for p in parts]
            except ValueError:
                coords = []
            chunk_by_node.setdefault(rec.get("node_id", ""), []).append(coords)
        else:
            ct = _KIND_TO_TYPE.get(kind, ConflictType.ZarrMetadataDoubleUpdate)
            out.append(Conflict(ct, rec.get("path") or rec.get("node_id", "")))
    for node_id, coords in sorted(chunk_by_node.items()):
        out.append(Conflict(ConflictType.ChunkDoubleUpdate, node_id, coords))
    return out


__all__ = [
    "BasicConflictSolver",
    "Conflict",
    "ConflictDetector",
    "ConflictSolver",
    "ConflictType",
    "VersionSelection",
    "conflicts_of",
]
