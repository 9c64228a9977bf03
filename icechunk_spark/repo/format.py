"""On-disk format for the versioned chunk store.

Layout (object-store compatible — every file is written once and never
mutated; ref updates use create-exclusive generation files, the same
scheme icechunk uses for S3 conditional writes — icechunk/src/refs.rs):

    <repo>/repo.json                       repo info + user metadata
    <repo>/refs/branch.<name>/<gen>.json   {"snapshot_id": ...}; highest gen wins
    <repo>/refs/tag.<name>/ref.json        immutable once created
    <repo>/snapshots/<id>.json             snapshot doc (parent, nodes, manifests)
    <repo>/manifests/<id>.parquet          chunk-ref rows (LSM: later shadows earlier)
    <repo>/chunks/<id>.parquet             chunk payloads (chunk_id, payload binary)
    <repo>/txlogs/<id>.parquet             per-commit change log (conflict detection)
    <repo>/staging/<session>/...           uncommitted manifests (discarded on abort)

Manifest row schema (MANIFEST_SCHEMA): chunk refs keyed by stable
node_id (so `move` never rewrites manifests — same reason icechunk
keys manifests by NodeId), with materialized chunk-grid coordinates
c0..c3 as plain int columns so slice pruning pushes down to the
parquet scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any

# ``inline`` carries the payload itself for chunks below the repo's
# inline_chunk_threshold_bytes (reference parity: ChunkPayload::Inline
# in icechunk-format) — small writes cost zero extra files/reads.
MANIFEST_SCHEMA = (
    "node_id string, chunk_key string, c0 int, c1 int, c2 int, c3 int, "
    "chunk_id string, file string, n_bytes bigint, op string, "
    "is_virtual boolean, vpath string, voffset bigint, vlength bigint, "
    "inline binary, seq bigint"
)

TXLOG_SCHEMA = "node_id string, chunk_key string, op string"

DTYPES = {"float64": 8, "float32": 4, "int64": 8, "int32": 4}


class RefError(Exception):
    pass


def new_id() -> str:
    return uuid.uuid4().hex


@dataclass
class ArrayMeta:
    node_id: str
    shape: list[int]
    chunk_shape: list[int]
    dtype: str = "float64"
    fill_value: float = 0.0
    attrs: dict[str, Any] = field(default_factory=dict)
    kind: str = "array"

    def __post_init__(self) -> None:
        if self.dtype not in DTYPES:
            raise ValueError(f"unsupported dtype {self.dtype}; one of {sorted(DTYPES)}")
        if len(self.shape) != len(self.chunk_shape):
            raise ValueError("shape and chunk_shape rank mismatch")
        if len(self.shape) > 4:
            raise ValueError("at most 4 dimensions supported")

    def grid_shape(self) -> list[int]:
        return [(s + c - 1) // c for s, c in zip(self.shape, self.chunk_shape)]


@dataclass
class GroupMeta:
    node_id: str
    attrs: dict[str, Any] = field(default_factory=dict)
    kind: str = "group"


def node_from_dict(d: dict[str, Any]) -> ArrayMeta | GroupMeta:
    d = dict(d)
    if d.pop("kind") == "array":
        return ArrayMeta(**d)
    return GroupMeta(**d)


@dataclass
class SnapshotInfo:
    id: str
    parent_id: str | None
    message: str
    metadata: dict[str, Any]
    written_at: float
    seq: int
    manifests: list[str]
    nodes: dict[str, dict[str, Any]]  # path -> node dict

    @property
    def written_at_iso(self) -> str:
        return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(self.written_at))


# --- json doc IO ---------------------------------------------------------

def _write_json_atomic(path: str, doc: dict, exclusive: bool = False) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if exclusive:
        # create-if-absent: the CAS primitive (object stores: If-None-Match)
        with open(path, "x") as f:
            json.dump(doc, f)
        return
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# --- snapshots -----------------------------------------------------------

def snapshot_path(root: str, snapshot_id: str) -> str:
    return os.path.join(root, "snapshots", f"{snapshot_id}.json")


def write_snapshot(root: str, snap: SnapshotInfo) -> None:
    _write_json_atomic(snapshot_path(root, snap.id), asdict(snap))


def read_snapshot(root: str, snapshot_id: str) -> SnapshotInfo:
    p = snapshot_path(root, snapshot_id)
    if not os.path.exists(p):
        raise RefError(f"snapshot {snapshot_id} not found")
    return SnapshotInfo(**_read_json(p))


def list_snapshot_ids(root: str) -> list[str]:
    d = os.path.join(root, "snapshots")
    if not os.path.isdir(d):
        return []
    return [f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")]


# --- refs ----------------------------------------------------------------
# Branches: directory of generation files; the highest generation is
# current.  Commit appends gen N+1 with create-exclusive semantics: two
# racing commits collide on the same filename and exactly one wins
# (icechunk/src/refs.rs uses the identical scheme on object storage).

def _branch_dir(root: str, name: str) -> str:
    return os.path.join(root, "refs", f"branch.{name}")


def _tag_path(root: str, name: str) -> str:
    return os.path.join(root, "refs", f"tag.{name}", "ref.json")


def branch_tip(root: str, name: str) -> tuple[int, str]:
    """Return (generation, snapshot_id) of the branch tip."""
    d = _branch_dir(root, name)
    if not os.path.isdir(d):
        raise RefError(f"branch {name} does not exist")
    gens = sorted(int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json"))
    if not gens:
        raise RefError(f"branch {name} has no generations")
    gen = gens[-1]
    return gen, _read_json(os.path.join(d, f"{gen:010d}.json"))["snapshot_id"]


def update_branch(root: str, name: str, snapshot_id: str, expected_gen: int) -> int:
    """CAS-advance the branch: write generation expected_gen+1
    exclusively.  Raises RefError if another commit got there first."""
    d = _branch_dir(root, name)
    gen = expected_gen + 1
    try:
        _write_json_atomic(
            os.path.join(d, f"{gen:010d}.json"), {"snapshot_id": snapshot_id}, exclusive=True
        )
    except FileExistsError as e:
        raise RefError(f"branch {name} moved (lost CAS race at gen {gen})") from e
    return gen


def create_branch(root: str, name: str, snapshot_id: str) -> None:
    d = _branch_dir(root, name)
    if os.path.isdir(d) and any(f.endswith(".json") for f in os.listdir(d)):
        raise RefError(f"branch {name} already exists")
    _write_json_atomic(os.path.join(d, f"{0:010d}.json"), {"snapshot_id": snapshot_id}, exclusive=True)


def delete_branch(root: str, name: str) -> None:
    import shutil

    d = _branch_dir(root, name)
    if not os.path.isdir(d):
        raise RefError(f"branch {name} does not exist")
    shutil.rmtree(d)


def list_branches(root: str) -> set[str]:
    d = os.path.join(root, "refs")
    if not os.path.isdir(d):
        return set()
    return {f[len("branch.") :] for f in os.listdir(d) if f.startswith("branch.")}


def create_tag(root: str, name: str, snapshot_id: str) -> None:
    try:
        _write_json_atomic(_tag_path(root, name), {"snapshot_id": snapshot_id}, exclusive=True)
    except FileExistsError as e:
        raise RefError(f"tag {name} already exists (tags are immutable)") from e


def read_tag(root: str, name: str) -> str:
    p = _tag_path(root, name)
    if not os.path.exists(p):
        raise RefError(f"tag {name} does not exist")
    return _read_json(p)["snapshot_id"]


def delete_tag(root: str, name: str) -> None:
    import shutil

    d = os.path.dirname(_tag_path(root, name))
    if not os.path.isdir(d):
        raise RefError(f"tag {name} does not exist")
    # a deleted tag name can never be recreated (design-docs/006-tag-delete.md)
    shutil.rmtree(d)
    _write_json_atomic(os.path.join(os.path.dirname(d), f"tag-deleted.{name}.json"), {})


def tag_was_deleted(root: str, name: str) -> bool:
    return os.path.exists(os.path.join(root, "refs", f"tag-deleted.{name}.json"))


def list_tags(root: str) -> set[str]:
    d = os.path.join(root, "refs")
    if not os.path.isdir(d):
        return set()
    return {f[len("tag.") :] for f in os.listdir(d) if f.startswith("tag.") and not f.startswith("tag-deleted")}


# --- repo info -----------------------------------------------------------

def repo_info_path(root: str) -> str:
    return os.path.join(root, "repo.json")


def write_repo_info(root: str, doc: dict) -> None:
    _write_json_atomic(repo_info_path(root), doc)


def read_repo_info(root: str) -> dict:
    return _read_json(repo_info_path(root))
