"""Repository: lifecycle, refs, ancestry, diff, and maintenance ops.

Mirrors icechunk-python/python/icechunk/repository.py; maintenance
(garbage_collect / expire_snapshots / rewrite_manifests /
chunk_storage_stats — icechunk/src/ops/) runs as Spark jobs over the
manifest tables so none of it ever materializes chunk lists on the
driver.
"""

from __future__ import annotations

import os
import shutil
import time
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.engine import local_df
from icechunk_spark.tracing import traced as _traced

from icechunk_spark.repo import format as fmt
from icechunk_spark.repo import fsio
from icechunk_spark.repo import manifests as mf
from icechunk_spark.repo.admin import (
    FEATURE_FLAGS,
    FeatureFlag,
    RepoAvailability,
    RepoStatus,
    Update,
    check_flag,
)
from icechunk_spark.repo.errbase import IcechunkError
from icechunk_spark.repo.format import RefError, SnapshotInfo, new_id
from icechunk_spark.repo.storage import StorageConflict
from icechunk_spark.repo.session import ConflictSolver, Diff, Session, VersionSelector


def _resolve_cutoff(older_than_seconds, older_than, now: float, op: str) -> float:
    """Epoch cutoff from either a relative age in seconds or the
    reference's absolute ``datetime`` (naive = UTC).  Exactly one of
    the two must be given."""
    import datetime as _dt

    if (older_than_seconds is None) == (older_than is None):
        raise ValueError(
            f"{op}: pass exactly one of older_than_seconds (relative age) "
            "or an absolute datetime cutoff"
        )
    if older_than is None:
        return now - float(older_than_seconds)
    if isinstance(older_than, _dt.datetime):
        ts = older_than
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    # a bare number passed positionally in the datetime slot: treat as
    # relative seconds (ergonomic back-compat)
    return now - float(older_than)


def _dp(root: str, *parts: str) -> str:
    """Data-plane (Spark parquet) path under the repo's storage."""
    return fmt.data_path(root, os.path.join(*parts))

MAIN = "main"

# single source of truth for the spec version (ADVICE r4: a v1->v2
# migration must bump the open gate automatically, not leave a stale
# hardcoded constant here refusing freshly-migrated repos)
from icechunk_spark.repo.migrations import CURRENT_SPEC_VERSION as SPEC_VERSION  # noqa: E402


@dataclass
class CompressionConfig:
    """Metadata compression (reference: CompressionConfig — zstd level
    3 by default there; zlib here, the container's stdlib codec).
    Applies to snapshot JSON docs; manifests are parquet and already
    codec-compressed."""

    algorithm: str = "zlib"  # "zlib" | "none"
    level: int = 3

    def to_dict(self) -> dict[str, Any]:
        return {"algorithm": self.algorithm, "level": self.level}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CompressionConfig":
        return cls(algorithm=d.get("algorithm", "zlib"), level=int(d.get("level", 3)))


@dataclass
class CachingConfig:
    """Metadata caching (reference: CachingConfig).  In the Spark
    re-expression the one cache that matters is the resolved manifest
    DataFrame: with num_chunk_refs > 0, sessions persist() it so
    repeated reads in a session skip the resolve shuffle."""

    num_snapshot_nodes: int = 500_000
    num_chunk_refs: int = 15_000_000
    num_transaction_changes: int = 0
    num_bytes_attributes: int = 0
    num_bytes_chunks: int = 0

    def to_dict(self) -> dict[str, Any]:
        return {
            "num_snapshot_nodes": self.num_snapshot_nodes,
            "num_chunk_refs": self.num_chunk_refs,
            "num_transaction_changes": self.num_transaction_changes,
            "num_bytes_attributes": self.num_bytes_attributes,
            "num_bytes_chunks": self.num_bytes_chunks,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CachingConfig":
        return cls(**{k: int(v) for k, v in d.items() if k in cls.__dataclass_fields__})


@dataclass
class ManifestConfig:
    """Manifest policies (reference: ManifestConfig).  ``splitting``
    maps to the split-file count used by write_manifest;
    ``preload_paths`` lists node paths whose resolved manifests a
    readonly session eagerly persists (the reference's
    ManifestPreloadConfig, re-expressed as Spark caching)."""

    preload_paths: list[str] | None = None
    # Persisted ManifestSplittingConfig (reference:
    # icechunk-python/python/icechunk/config.py:59-64 and
    # design-docs/005): {"split_by_array": bool,
    # "max_refs_per_manifest": int | None, "rules": [...]}.  When set,
    # every commit writes per-array (and size-capped) manifest files
    # instead of one monolith; readers prune split files by node before
    # scanning.  A typed icechunk_spark.types.ManifestSplittingConfig
    # is accepted and compiled to the persisted form.
    splitting: dict[str, Any] | None = None
    # Typed preload policy (reference ManifestPreloadConfig) evaluated
    # at readonly_session open; persists alongside preload_paths.
    preload: Any = None
    # Reference parity #2274: how many manifests may be fetched /
    # updated concurrently during a commit, amend, flush, or
    # rewrite_manifests (reference default 1 = serial).  In this
    # engine commit-time manifest work is ONE partitioned Spark write
    # and manifest reads are Spark jobs, so per-file concurrency is
    # governed by cluster parallelism, not a driver-side loop — the
    # knob is accepted, validated, and persisted for config parity.
    max_concurrent_manifest_fetches_during_commit: int = 1

    def __post_init__(self) -> None:
        if self.splitting is not None and hasattr(self.splitting, "to_splitting_dict"):
            self.splitting = self.splitting.to_splitting_dict()
        if int(self.max_concurrent_manifest_fetches_during_commit) < 1:
            raise ValueError(
                "max_concurrent_manifest_fetches_during_commit must be >= 1"
            )

    def to_dict(self) -> dict[str, Any]:
        return {
            "preload_paths": self.preload_paths,
            "splitting": self.splitting,
            "preload": self.preload.to_dict() if self.preload else None,
            "max_concurrent_manifest_fetches_during_commit": int(
                self.max_concurrent_manifest_fetches_during_commit
            ),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ManifestConfig":
        preload = d.get("preload")
        if preload:
            from icechunk_spark.types import ManifestPreloadConfig

            preload = ManifestPreloadConfig.from_dict(preload)
        return cls(
            preload_paths=d.get("preload_paths"),
            splitting=d.get("splitting"),
            preload=preload,
            max_concurrent_manifest_fetches_during_commit=int(
                d.get("max_concurrent_manifest_fetches_during_commit", 1)
            ),
        )


@dataclass
class RepositoryConfig:
    """Persisted repository configuration (config.json).

    The Spark-relevant subset of the reference's RepositoryConfig
    (icechunk-python config.py): knobs that change how the data plane
    lays files out, plus compression/caching/manifest/retry policies.
    Unknown keys round-trip untouched so configs written by newer
    versions still open.
    """

    target_chunk_file_mb: int = 64
    manifest_split_files: int = 1
    inline_chunk_threshold_bytes: int = 512
    # name -> {"url_prefix": ...}; scopes where virtual chunk refs may
    # point (icechunk/src/virtual_chunks.rs VirtualChunkContainer)
    virtual_chunk_containers: dict[str, dict[str, Any]] | None = None
    compression: CompressionConfig | None = None
    caching: CachingConfig | None = None
    manifest: ManifestConfig | None = None
    # bound on commit CAS retries (reference: RepoUpdateRetryConfig)
    repo_update_retries: int = 10
    # thread fan-out for store.get_partial_values (reference knob)
    get_partial_values_concurrency: int = 1
    extra: dict[str, Any] | None = None

    _KNOWN = (
        "target_chunk_file_mb",
        "manifest_split_files",
        "inline_chunk_threshold_bytes",
        "virtual_chunk_containers",
        "compression",
        "caching",
        "manifest",
        "repo_update_retries",
        "get_partial_values_concurrency",
    )

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RepositoryConfig":
        known: dict[str, Any] = {f: d[f] for f in cls._KNOWN if f in d}
        if known.get("compression") is not None:
            known["compression"] = CompressionConfig.from_dict(known["compression"])
        if known.get("caching") is not None:
            known["caching"] = CachingConfig.from_dict(known["caching"])
        if known.get("manifest") is not None:
            known["manifest"] = ManifestConfig.from_dict(known["manifest"])
        extra = {k: v for k, v in d.items() if k not in known}
        return cls(**known, extra=extra or None)

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "target_chunk_file_mb": self.target_chunk_file_mb,
            "manifest_split_files": self.manifest_split_files,
            "inline_chunk_threshold_bytes": self.inline_chunk_threshold_bytes,
            "repo_update_retries": self.repo_update_retries,
            "get_partial_values_concurrency": self.get_partial_values_concurrency,
        }
        if self.virtual_chunk_containers is not None:
            out["virtual_chunk_containers"] = self.virtual_chunk_containers
        if self.compression is not None:
            out["compression"] = self.compression.to_dict()
        if self.caching is not None:
            out["caching"] = self.caching.to_dict()
        if self.manifest is not None:
            out["manifest"] = self.manifest.to_dict()
        if self.extra:
            out.update(self.extra)
        return out


@dataclass
class GCSummary:
    chunk_files_deleted: int = 0
    manifests_deleted: int = 0
    snapshots_deleted: int = 0
    txlogs_deleted: int = 0


class Repository:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        authorize_virtual_chunk_access: dict[str, Any] | None = None,
    ):
        self.spark = spark
        self.root = root
        # url_prefix -> credential (opaque; local/None for file paths),
        # mirroring Repository.open(..., authorize_virtual_chunk_access)
        from icechunk_spark.credentials import warn_on_none_virtual_chunk_credentials

        warn_on_none_virtual_chunk_credentials(authorize_virtual_chunk_access)
        self._virtual_auth = dict(authorize_virtual_chunk_access or {})
        # runtime RepositoryConfig override (reopen(config=...)): takes
        # effect for this handle and its sessions WITHOUT persisting —
        # reference parity: Repository.reopen (repository.py:626)
        self._config_override: RepositoryConfig | None = None

    # notebook ergonomics (reference parity: display.rs dataclass
    # repr + _repr_html_, icechunk-python repository.py:92-99)
    def __repr__(self) -> str:
        try:
            branches = sorted(self.list_branches())
            tags = sorted(self.list_tags())
            return (
                f"Repository(root={self.root!r}, spec_version="
                f"{self.spec_version()}, branches={branches}, tags={tags})"
            )
        except Exception:
            return f"Repository(root={self.root!r})"

    def _repr_html_(self) -> str:
        import html as _html

        rows = "".join(
            f"<tr><td><b>{k}</b></td><td>{_html.escape(str(v))}</td></tr>"
            for k, v in (
                ("root", self.root),
                ("spec_version", self.spec_version()),
                ("branches", ", ".join(sorted(self.list_branches()))),
                ("tags", ", ".join(sorted(self.list_tags())) or "—"),
            )
        )
        return f"<table><caption>icechunk_spark.Repository</caption>{rows}</table>"

    def reopen(
        self,
        *,
        config: "RepositoryConfig | None" = None,
        authorize_virtual_chunk_access: dict[str, Any] | None = None,
    ) -> "Repository":
        """A new handle over the same storage with a different runtime
        config and/or virtual-chunk credentials (reference parity:
        Repository.reopen).  The config override applies to sessions
        opened from the new handle but is NOT persisted — save_config
        remains the explicit persistence path."""
        out = Repository(
            self.spark,
            self.root,
            authorize_virtual_chunk_access=(
                authorize_virtual_chunk_access
                if authorize_virtual_chunk_access is not None
                else dict(self._virtual_auth)
            ),
        )
        out._config_override = config if config is not None else self._config_override
        return out

    # --- virtual chunk containers (icechunk/src/virtual_chunks.rs) --------

    def set_virtual_chunk_container(self, name: str, url_prefix: str) -> None:
        """Register (or replace) a container scoping where virtual
        chunk refs may point.  Persisted in config.json."""
        if not url_prefix.endswith("/"):
            raise ValueError("VirtualChunkContainer url_prefix must end in a / character")
        cfg = self.config()
        containers = dict(cfg.virtual_chunk_containers or {})
        containers[name] = {"url_prefix": url_prefix}
        cfg.virtual_chunk_containers = containers
        self.save_config(cfg)

    def delete_virtual_chunk_container(self, name: str) -> None:
        cfg = self.config()
        containers = dict(cfg.virtual_chunk_containers or {})
        containers.pop(name, None)
        cfg.virtual_chunk_containers = containers
        self.save_config(cfg)

    def virtual_chunk_containers(self) -> dict[str, str]:
        """name -> url_prefix of every configured container."""
        cfg = self.config()
        return {
            n: c["url_prefix"] for n, c in (cfg.virtual_chunk_containers or {}).items()
        }

    @property
    def authorized_virtual_container_prefixes(self) -> set[str]:
        """Configured container prefixes this Repository instance was
        opened with access to (reference parity:
        Repository.authorized_virtual_container_prefixes)."""
        configured = set(self.virtual_chunk_containers().values())
        return {p for p in self._virtual_auth if p in configured}

    # --- status / feature flags / ops log (admin plane) -------------------

    def get_status(self) -> RepoStatus:
        """Reference parity: Repository.get_status (repository.py:798)."""
        doc = fmt.read_repo_info(self.root).get("status")
        if doc is None:
            return RepoStatus(availability=RepoAvailability.online)
        return RepoStatus.from_dict(doc)

    @property
    def status(self) -> RepoStatus:
        return self.get_status()

    def set_status(self, status: RepoStatus) -> None:
        info = fmt.read_repo_info(self.root)
        info["status"] = status.to_dict()
        fmt.write_repo_info(self.root, info)
        self._log_update({"type": "StatusChanged", "availability": status.availability.name})

    def _require_online(self, what: str) -> None:
        st = self.get_status()
        if st.availability is not RepoAvailability.online:
            reason = st.limited_availability_reason or "repository is read-only"
            raise RefError(f"cannot {what}: {reason}")

    def _flag_settings(self) -> dict[str, bool]:
        return dict(fmt.read_repo_info(self.root).get("feature_flags", {}))

    def feature_flags(self) -> list[FeatureFlag]:
        """All flags with id, name, default, setting, and effective
        state (reference parity: feature_flags.rs registry)."""
        settings = self._flag_settings()
        return [
            FeatureFlag(id=fid, name=name, default=default, setting=settings.get(name))
            for name, (fid, default) in sorted(FEATURE_FLAGS.items(), key=lambda kv: kv[1][0])
        ]

    def enabled_feature_flags(self) -> list[FeatureFlag]:
        return [f for f in self.feature_flags() if f.enabled]

    def disabled_feature_flags(self) -> list[FeatureFlag]:
        return [f for f in self.feature_flags() if not f.enabled]

    def set_feature_flag(self, name: str, setting: bool | None) -> None:
        """True = enable, False = disable, None = reset to default."""
        if name not in FEATURE_FLAGS:
            raise KeyError(f"unknown feature flag {name!r}")
        info = fmt.read_repo_info(self.root)
        flags = dict(info.get("feature_flags", {}))
        if setting is None:
            flags.pop(name, None)
        else:
            flags[name] = bool(setting)
        info["feature_flags"] = flags
        fmt.write_repo_info(self.root, info)
        self._log_update({"type": "FeatureFlagChanged", "name": name, "setting": setting})

    def _check_flag(self, name: str, what: str) -> None:
        check_flag(self._flag_settings(), name, what)

    def _log_update(self, kind: dict[str, Any]) -> None:
        u = Update(kind=kind)
        key = f"ops_log/{u.updated_at:020.6f}-{new_id()[:8]}.json"
        fmt.resolve_storage(self.root).put_json(key, u.to_dict())

    def ops_log(self) -> Iterator[Update]:
        """Summary of administrative changes, oldest first (reference
        parity: Repository.ops_log, repository.py:1067)."""
        s = fmt.resolve_storage(self.root)
        for name in sorted(s.list_dir("ops_log")):
            yield Update.from_dict(s.get_json(f"ops_log/{name}"))

    # --- lifecycle --------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: "str | None" = None,
        metadata: dict | None = None,
        spec_version: int | None = None,
        *,
        config: "RepositoryConfig | None" = None,
        authorize_virtual_chunk_access: dict[str, Any] | None = None,
        storage: Any | None = None,
        check_clean_root: bool = True,
    ) -> "Repository":
        """Create a repository.  ``spec_version`` pins the on-disk
        layout version (reference parity: Repository.create's
        spec_version arg) so repos can stay writable/readable by older
        engines; default = the engine's current spec.  Sessions honor
        the pinned version (a v1 repo keeps the flat chunk layout until
        migrated).  ``config`` is persisted to config.json at create
        (reference parity: Repository.create's config arg).
        ``storage=`` is the reference's keyword spelling of the root
        (any Storage instance works in either slot);
        ``check_clean_root=False`` skips the leftover-object probe
        (reference repository.py create kwarg) for roots known to hold
        unrelated files.

        Empty-prefix object-store roots (``s3a://bucket`` with no key
        prefix) are REJECTED at create (reference #2239: the
        reference's native S3 backend used to write ``/chunks/...``
        under a leading slash at an empty prefix, making repos
        unreadable by external tools and GC lossy; it now refuses such
        creates too).  This rebuild's parquet layout never emits a
        leading slash — the guard exists so every repo lives under an
        explicit prefix that external tools and bucket-wide LIST
        tooling can scope to.  Pre-existing empty-prefix repos (none
        can have been created here) would still OPEN fine: the guard
        is create-only, matching the reference's stance."""
        if root is None and storage is not None:
            root = storage
        root_str = root if isinstance(root, str) else getattr(root, "root", None)
        if isinstance(root_str, str) and "://" in root_str:
            from urllib.parse import urlsplit

            parts = urlsplit(root_str)
            # file:// and memory:// are not the #2239 surface (no
            # external-tool-readability or bucket-wide-LIST concern);
            # the reference's gate is likewise object-store-specific
            if parts.scheme not in ("file", "memory") and not parts.path.strip("/"):
                raise ValueError(
                    f"cannot create a repository at the empty prefix of an "
                    f"object store ({root_str!r}); use an explicit key "
                    f"prefix, e.g. {root_str.rstrip('/')}/myrepo "
                    f"(reference #2239)"
                )
        if cls.exists(root):
            from icechunk_spark.errors import AlreadyExistsError

            raise AlreadyExistsError(f"repository already exists at {root}")
        if check_clean_root:
            st = fmt.resolve_storage(root)
            leftovers = [
                d for d in ("snapshots", "refs", "chunks", "manifests")
                if st.list_dir(d)
            ]
            if leftovers:
                from icechunk_spark.errors import AlreadyExistsError

                raise AlreadyExistsError(
                    f"root at {root} holds leftover repository objects "
                    f"({', '.join(leftovers)}); pass check_clean_root=False "
                    "to create anyway"
                )
        v = SPEC_VERSION if spec_version is None else int(spec_version)
        if not (1 <= v <= SPEC_VERSION):
            raise ValueError(
                f"spec_version must be between 1 and {SPEC_VERSION} (got {v})"
            )
        dp = fmt.data_path(root)
        if "://" not in dp:  # object stores have no dirs to pre-create
            os.makedirs(dp, exist_ok=True)
        root_snap = SnapshotInfo(
            id=new_id(),
            parent_id=None,
            message="Repository initialized",
            metadata={},
            written_at=time.time(),
            seq=0,
            manifests=[],
            nodes={"/": {"node_id": new_id(), "kind": "group", "attrs": {}}},
        )
        fmt.write_snapshot(root, root_snap)
        fmt.create_branch(root, MAIN, root_snap.id)
        fmt.write_repo_info(
            root,
            {"format_version": v, "metadata": metadata or {}, "default_commit_metadata": {}},
        )
        if config is not None:
            fmt.write_config_doc(root, config.to_dict())
        repo = cls(spark, root)
        if authorize_virtual_chunk_access is not None:
            repo = repo.reopen(authorize_virtual_chunk_access=authorize_virtual_chunk_access)
        return repo

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        root: "str | None" = None,
        authorize_virtual_chunk_access: dict[str, Any] | None = None,
        *,
        config: "RepositoryConfig | None" = None,
        storage: Any | None = None,
    ) -> "Repository":
        if root is None and storage is not None:
            root = storage
        if not cls.exists(root):
            from icechunk_spark.errors import RepositoryNotFoundError

            raise RepositoryNotFoundError(f"no repository at {root}")
        # spec gate (migrations.py): refuse layouts this engine cannot
        # read correctly rather than misreading them.  Any version in
        # [1, SPEC_VERSION] opens fine — sessions honor the repo's
        # pinned layout (e.g. flat chunk files on v1) and migration is
        # an explicit opt-in for newer-layout features.
        v = int(fmt.read_repo_info(root).get("format_version", 0))
        if v > SPEC_VERSION:
            raise RefError(
                f"repository spec version {v} is newer than this engine's "
                f"{SPEC_VERSION}; upgrade the engine"
            )
        if v < 1:
            raise RefError(
                f"repository spec version {v} predates the v1 layout "
                "contract; run icechunk_spark.repo.migrations."
                "migrate_repository (or `python -m icechunk_spark.cli "
                "migrate`) to upgrade it in place"
            )
        repo = cls(spark, root, authorize_virtual_chunk_access=authorize_virtual_chunk_access)
        if config is not None:
            # runtime override, not persisted (reference parity: open's
            # config wins over the stored one for this handle only)
            repo = repo.reopen(config=config)
        return repo

    @classmethod
    def open_or_create(
        cls,
        spark: SparkSession,
        root: "str | None" = None,
        *,
        storage: Any | None = None,
        config: "RepositoryConfig | None" = None,
        authorize_virtual_chunk_access: dict[str, Any] | None = None,
        create_version: int | None = None,
        check_clean_root: bool = True,
        **kwargs: Any,
    ) -> "Repository":
        if root is None and storage is not None:
            root = storage
        kwargs.setdefault("config", config)
        kwargs.setdefault("authorize_virtual_chunk_access", authorize_virtual_chunk_access)
        if create_version is not None:
            kwargs.setdefault("spec_version", create_version)
        kwargs.setdefault("check_clean_root", check_clean_root)
        if cls.exists(root):
            # open honors every kwarg open() understands — silently
            # dropping e.g. authorize_virtual_chunk_access would make
            # behavior depend on whether the repo pre-existed
            return cls.open(
                spark,
                root,
                authorize_virtual_chunk_access=kwargs.get(
                    "authorize_virtual_chunk_access"
                ),
                config=kwargs.get("config"),
            )
        return cls.create(spark, root, **kwargs)

    @staticmethod
    def exists(root: "str | None" = None, *, storage=None, storage_settings=None) -> bool:
        del storage_settings  # advisory (reference signature compat)
        return fmt.repo_exists(root if root is not None else storage)

    @staticmethod
    def fetch_spec_version(root: "str | None" = None, *, storage=None, storage_settings=None) -> int:
        """The spec version recorded at ``root`` WITHOUT opening (and
        without the open gate) — reference parity:
        Repository.fetch_spec_version (repository.py:475)."""
        del storage_settings  # advisory (reference signature compat)
        from icechunk_spark.repo.migrations import spec_version_of

        return spec_version_of(root if root is not None else storage)

    @property
    def storage(self):
        """The resolved metadata-plane Storage backend (reference
        parity: Repository.storage, repository.py:603)."""
        from icechunk_spark.repo.storage import resolve_storage

        return resolve_storage(self.root)

    # --- repo metadata ----------------------------------------------------

    def metadata(self) -> dict[str, Any]:
        return fmt.read_repo_info(self.root)["metadata"]

    def get_metadata(self) -> dict[str, Any]:
        """Alias of :meth:`metadata` (reference parity: both
        get_metadata and the metadata property exist,
        repository.py:712-724)."""
        return self.metadata()

    def set_metadata(self, metadata: dict[str, Any]) -> None:
        info = fmt.read_repo_info(self.root)
        info["metadata"] = metadata
        fmt.write_repo_info(self.root, info)

    def update_metadata(self, metadata: dict[str, Any]) -> dict[str, Any]:
        merged = {**self.metadata(), **metadata}
        self.set_metadata(merged)
        return merged

    def default_commit_metadata(self) -> dict[str, Any]:
        return fmt.read_repo_info(self.root).get("default_commit_metadata", {})

    def set_default_commit_metadata(self, metadata: dict[str, Any]) -> None:
        info = fmt.read_repo_info(self.root)
        info["default_commit_metadata"] = metadata
        fmt.write_repo_info(self.root, info)

    # --- config -----------------------------------------------------------

    def config(self) -> RepositoryConfig:
        if self._config_override is not None:
            return self._config_override
        return self.fetch_config(self.root) or RepositoryConfig()

    @staticmethod
    def fetch_config(root: "str | None" = None, *, storage=None) -> RepositoryConfig | None:
        doc = fmt.read_config_doc(root if root is not None else storage)
        return None if doc is None else RepositoryConfig.from_dict(doc)

    def save_config(self, config: RepositoryConfig) -> None:
        fmt.write_config_doc(self.root, config.to_dict())

    def spec_version(self) -> int:
        return int(fmt.read_repo_info(self.root).get("format_version", SPEC_VERSION))

    # --- inspection (testing/debugging surface) ---------------------------

    def inspect_metadata_file(self, relpath: str) -> dict[str, Any]:
        """Header inspection of ANY metadata file by repo-relative path
        (reference #2216: fetch_header works for every metadata file
        kind).  Kind/format/compression are discovered from content;
        spec_version is the repo's pinned format version.  Read-only,
        no SparkSession needed."""
        return fmt.inspect_metadata_file(self.root, relpath)

    def inspect_repo_info(self) -> dict[str, Any]:
        """Top-level repo metadata: branch→snapshot map, tags, deleted
        tags, all snapshot ids, repo metadata (reference parity:
        Repository.inspect_repo_info)."""
        info = fmt.read_repo_info(self.root)
        return {
            "spec_version": self.spec_version(),
            "branches": {b: fmt.branch_tip(self.root, b)[1] for b in self.list_branches()},
            "tags": {t: fmt.read_tag(self.root, t) for t in self.list_tags()},
            "deleted_tags": sorted(
                f[len("tag-deleted.") : -len(".json")]
                for f in fmt.resolve_storage(self.root).list_dir("refs")
                if f.startswith("tag-deleted.")
            ),
            "snapshots": fmt.list_snapshot_ids(self.root),
            "metadata": info.get("metadata", {}),
        }

    def inspect_manifest(
        self, manifest_rel: str | None = None, *, manifest_id: str | None = None
    ) -> dict[str, Any]:
        """Per-manifest storage statistics (chunk refs by kind, per
        array) as one Spark aggregation over the manifest parquet.
        Accepts the manifest's relative path or (reference signature)
        its bare id — resolved to ``manifests/<id>.parquet``."""
        if (manifest_rel is None) == (manifest_id is None):
            raise ValueError("pass exactly one of manifest_rel or manifest_id")
        if manifest_rel is None:
            manifest_rel = f"manifests/{manifest_id}.parquet"
        df = self.spark.read.schema(fmt.MANIFEST_SCHEMA).parquet(
            _dp(self.root, manifest_rel)
        )
        per_array = (
            df.groupBy("node_id")
            .agg(
                F.count(F.lit(1)).alias("chunk_refs"),
                F.sum(F.when(F.col("is_virtual"), 1).otherwise(0)).alias("virtual"),
                F.sum(F.when(F.col("inline").isNotNull(), 1).otherwise(0)).alias("inline"),
                F.sum(
                    F.when(
                        (~F.col("is_virtual"))
                        & F.col("inline").isNull()
                        & (F.col("op") == "set"),
                        1,
                    ).otherwise(0)
                ).alias("native"),
                F.sum(F.coalesce("n_bytes", F.lit(0))).alias("bytes"),
            )
            .collect()
        )
        return {
            "id": manifest_rel,
            "size_bytes": fsio.dir_size(_dp(self.root, manifest_rel)),
            "num_arrays": len(per_array),
            "total_chunk_refs": sum(r["chunk_refs"] for r in per_array),
            "total_native": sum(r["native"] for r in per_array),
            "total_inline": sum(r["inline"] for r in per_array),
            "total_virtual": sum(r["virtual"] for r in per_array),
            "arrays": {
                r["node_id"]: {
                    "chunk_refs": r["chunk_refs"],
                    "native": r["native"],
                    "inline": r["inline"],
                    "virtual": r["virtual"],
                    "bytes": r["bytes"],
                }
                for r in per_array
            },
        }

    def inspect_transaction_log(self, snapshot_id: str) -> dict[str, Any]:
        """What one commit changed: chunk writes/deletes per node and
        node-level ops (reference parity: inspect_transaction_log).
        For an expiration boundary, ``pruned_ancestor_tx_logs`` lists
        the carried logs of commits squashed out of history
        (design-doc 016 inspect consumer)."""
        pruned: list[str] = []
        try:
            pruned = fmt.read_snapshot(self.root, snapshot_id).pruned_ancestor_tx_logs
        except RefError:
            pass
        p = _dp(self.root, "txlogs", f"{snapshot_id}.parquet")
        if not fsio.exists(p):
            return {
                "id": snapshot_id,
                "chunks_updated": {},
                "node_ops": [],
                "pruned_ancestor_tx_logs": pruned,
            }
        tx = self.spark.read.schema(fmt.TXLOG_SCHEMA).parquet(p)
        chunk_rows = (
            tx.filter(F.col("chunk_key") != "")
            .groupBy("node_id", "op")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        node_rows = tx.filter(F.col("chunk_key") == "").collect()
        chunks: dict[str, dict[str, int]] = {}
        for r in chunk_rows:
            chunks.setdefault(r["node_id"], {})[r["op"]] = r["n"]
        return {
            "id": snapshot_id,
            "chunks_updated": chunks,
            "node_ops": [{"node_id": r["node_id"], "op": r["op"]} for r in node_rows],
            "pruned_ancestor_tx_logs": pruned,
        }

    # --- refs -------------------------------------------------------------

    def create_branch(self, branch: str, snapshot_id: str) -> None:
        self._require_online("create branch")
        fmt.read_snapshot(self.root, snapshot_id)  # must exist
        fmt.create_branch(self.root, branch, snapshot_id)
        self._log_update({"type": "BranchCreated", "name": branch})

    def list_branches(self) -> set[str]:
        return fmt.list_branches(self.root)

    def lookup_branch(self, branch: str) -> str:
        return fmt.branch_tip(self.root, branch)[1]

    def reset_branch(
        self, branch: str, snapshot_id: str, *, from_snapshot_id: str | None = None
    ) -> None:
        """Point a branch at ``snapshot_id``.  ``from_snapshot_id``
        (reference repository.py:1235) makes the reset conditional: it
        fails if the branch tip moved away from that snapshot since the
        caller read it — the ref-level CAS."""
        self._require_online("reset branch")
        fmt.read_snapshot(self.root, snapshot_id)
        gen, cur = fmt.branch_tip(self.root, branch)
        if from_snapshot_id is not None and cur != from_snapshot_id:
            raise StorageConflict(
                f"branch {branch} tip is {cur}, not the expected "
                f"{from_snapshot_id}; refusing the conditional reset"
            )
        fmt.update_branch(self.root, branch, snapshot_id, expected_gen=gen)
        self._log_update(
            {"type": "BranchReset", "name": branch, "to_snap_id": snapshot_id}
        )

    def delete_branch(self, branch: str) -> None:
        if branch == MAIN:
            raise RefError("cannot delete main")
        self._require_online("delete branch")
        prev = fmt.branch_tip(self.root, branch)[1]
        fmt.delete_branch(self.root, branch)
        self._log_update(
            {"type": "BranchDeleted", "name": branch, "previous_snap_id": prev}
        )

    def create_tag(self, tag: str, snapshot_id: str) -> None:
        self._require_online("create tag")
        self._check_flag("create_tag", "tag creation")
        if fmt.tag_was_deleted(self.root, tag):
            raise RefError(f"tag {tag} was deleted; names are never reused")
        fmt.read_snapshot(self.root, snapshot_id)
        fmt.create_tag(self.root, tag, snapshot_id)
        self._log_update({"type": "TagCreated", "name": tag})

    def delete_tag(self, tag: str) -> None:
        self._require_online("delete tag")
        self._check_flag("delete_tag", "tag deletion")
        fmt.delete_tag(self.root, tag)
        self._log_update({"type": "TagDeleted", "name": tag})

    def list_tags(self) -> set[str]:
        return fmt.list_tags(self.root)

    def lookup_tag(self, tag: str) -> str:
        return fmt.read_tag(self.root, tag)

    def lookup_snapshot(self, snapshot_id: str) -> SnapshotInfo:
        return fmt.read_snapshot(self.root, snapshot_id)

    # --- history ----------------------------------------------------------

    def ancestry(
        self,
        *,
        branch: str | None = None,
        tag: str | None = None,
        snapshot_id: str | None = None,
    ) -> Iterator[SnapshotInfo]:
        sid = VersionSelector(branch, tag, snapshot_id).resolve(self.root)
        while sid is not None:
            snap = fmt.read_snapshot(self.root, sid)
            yield snap
            sid = snap.parent_id

    def async_ancestry(
        self,
        *,
        branch: str | None = None,
        tag: str | None = None,
        snapshot_id: str | None = None,
    ):
        """Async-iterator variant of :meth:`ancestry` (reference
        repository.py:984) — each snapshot read runs in a thread so
        the event loop is never blocked on object-store IO.  Returns
        an :class:`~icechunk_spark.repo.aio.AsyncCloseableIterator`
        (reference #2240): ``aclose()``/``contextlib.aclosing`` give
        deterministic early-exit cleanup."""
        from icechunk_spark.repo.aio import AsyncCloseableIterator

        return AsyncCloseableIterator(
            lambda: self.ancestry(branch=branch, tag=tag, snapshot_id=snapshot_id)
        )

    def ancestry_graph(
        self,
        plain: bool = False,
        *,
        branch: str | None = None,
        tag: str | None = None,
        snapshot_id: str | None = None,
    ):
        """Visual commit history (reference parity:
        Repository.ancestry_graph — repository.py:1016).  With no ref
        argument, shows all branches/tags as a tree; with one of
        branch/tag/snapshot_id, that ref's linear history.  ``print()``
        the result for a terminal tree; notebooks render SVG; ``plain``
        swaps Unicode bullets for ASCII (CI / log files)."""
        from icechunk_spark.snapshots import AncestryGraph

        return AncestryGraph.from_repository(
            self, plain=plain, branch=branch, tag=tag, snapshot_id=snapshot_id
        )

    def _parent_map(self) -> dict[str, str | None]:
        """snapshot_id -> parent_id over all refs' histories."""
        out: dict[str, str | None] = {}
        for ref in self.list_branches():
            for s in self.ancestry(branch=ref):
                if s.id in out:
                    break
                out[s.id] = s.parent_id
        for ref in self.list_tags():
            for s in self.ancestry(tag=ref):
                if s.id in out:
                    break
                out[s.id] = s.parent_id
        return out

    def inspect_snapshot(self, snapshot_id: str) -> dict[str, Any]:
        snap = fmt.read_snapshot(self.root, snapshot_id)
        man = mf.read_manifest_files(self.spark, self.root, snap.manifests)
        stats = man.agg(
            F.count(F.lit(1)).alias("manifest_rows"),
            F.sum(F.when(F.col("op") == "set", 1).otherwise(0)).alias("chunk_refs"),
        ).collect()[0]
        return {
            "id": snap.id,
            "parent_id": snap.parent_id,
            "message": snap.message,
            "metadata": snap.metadata,
            "written_at": snap.written_at_iso,
            "seq": snap.seq,
            "manifest_files": len(snap.manifests),
            "manifest_rows": stats["manifest_rows"] or 0,
            "chunk_refs": stats["chunk_refs"] or 0,
            "nodes": {p: n["kind"] for p, n in sorted(snap.nodes.items())},
        }

    def list_manifest_files(self, snapshot_id: str) -> list[str]:
        return list(fmt.read_snapshot(self.root, snapshot_id).manifests)

    # --- sessions ---------------------------------------------------------

    def readonly_session(
        self,
        branch: str | None = None,
        *,
        tag: str | None = None,
        snapshot_id: str | None = None,
        as_of: "float | None" = None,
    ) -> Session:
        """Read-only checkout.  ``as_of`` (unix seconds or a datetime),
        combined with ``branch``, opens the last snapshot written at or
        before that time (reference parity: readonly_session(as_of=...),
        icechunk-python repository.py:1503)."""
        if branch is None and tag is None and snapshot_id is None:
            branch = MAIN
        if as_of is not None:
            if branch is None:
                raise ValueError("as_of requires a branch")
            cutoff = as_of.timestamp() if hasattr(as_of, "timestamp") else float(as_of)
            sid = None
            for snap in self.ancestry(branch=branch):
                if snap.written_at <= cutoff:
                    sid = snap.id
                    break
            if sid is None:
                raise RefError(
                    f"branch {branch} has no snapshot at or before {as_of}"
                )
            branch, tag, snapshot_id = None, None, sid
        sid = VersionSelector(branch, tag, snapshot_id).resolve(self.root)
        s = self._bind_virtual_auth(
            Session(self.spark, self.root, sid, branch=None, read_only=True)
        )
        # ManifestConfig.preload_paths: eagerly resolve (and, with
        # caching on, persist) the listed arrays' manifests so the
        # session's first read skips the resolve shuffle
        cfg = self.config()
        preload = list((cfg.manifest.preload_paths if cfg.manifest else None) or [])
        preload_cfg = (cfg.manifest.preload if cfg.manifest else None) or None
        if preload_cfg is not None:
            # ManifestPreloadConfig (reference parity): evaluate the
            # condition over (path, #chunks) pairs — #chunks comes from
            # the array's chunk grid, driver-side metadata only
            import math

            pairs = []
            for p, n in s._nodes.items():
                if n.get("kind") != "array":
                    continue
                shape, cshape = n.get("shape") or [], n.get("chunk_shape") or []
                nchunks = 1
                for dim, c in zip(shape, cshape):
                    nchunks *= max(1, math.ceil(dim / max(1, c)))
                pairs.append((p, nchunks))
            preload.extend(preload_cfg.paths_to_preload(sorted(pairs)))
        for p in preload:
            try:
                node_id = s.array_meta(p).node_id
                s._cached_base_manifest(node_id, None).count()
            except Exception:
                pass  # preload is best-effort; a missing path is not an error
        return s

    def writable_session(self, branch: str = MAIN) -> Session:
        self._require_online("open a writable session")
        _, sid = fmt.branch_tip(self.root, branch)
        return self._bind_virtual_auth(
            Session(self.spark, self.root, sid, branch=branch, read_only=False)
        )

    def _bind_virtual_auth(self, s: Session) -> Session:
        containers = self.virtual_chunk_containers()
        if containers:
            s._virtual_containers = sorted(containers.values())
            s._virtual_authorized = self.authorized_virtual_container_prefixes
            s._virtual_container_names = dict(containers)
        if self._config_override is not None:
            s._config_override = self._config_override.to_dict()
        return s

    def rearrange_session(self, branch: str = MAIN) -> Session:
        """Writable session restricted to ``move`` (rename/reorganize
        the node hierarchy) — reference parity: rearrange_session."""
        s = self.writable_session(branch)
        s._rearrange_only = True
        return s

    @contextmanager
    def transaction(
        self,
        branch: str = MAIN,
        *,
        message: str,
        metadata: dict | None = None,
        rebase_with: ConflictSolver | None = None,
        rebase_tries: int = 1_000,
    ):
        """Context manager: commit on clean exit, discard on error."""
        session = self.writable_session(branch)
        try:
            yield session
        except Exception:
            session.discard_changes()
            raise
        md = {**self.default_commit_metadata(), **(metadata or {})}
        # an empty transaction body commits nothing rather than failing
        # (the explicit commit() API keeps the reference's strict
        # allow_empty=False default)
        if session.has_uncommitted_changes():
            session.commit(
                message, metadata=md, rebase_with=rebase_with, rebase_tries=rebase_tries
            )

    # --- diff -------------------------------------------------------------

    def diff(
        self,
        *,
        from_branch: str | None = None,
        from_tag: str | None = None,
        from_snapshot_id: str | None = None,
        to_branch: str | None = None,
        to_tag: str | None = None,
        to_snapshot_id: str | None = None,
    ) -> Diff:
        """Structural diff between two snapshots: node changes plus
        chunk-level add/delete/update counts (manifest join, no chunk
        reads — icechunk/src/diff.rs)."""
        a_id = VersionSelector(from_branch, from_tag, from_snapshot_id).resolve(self.root)
        b_id = VersionSelector(to_branch, to_tag, to_snapshot_id).resolve(self.root)
        counts = (
            self.diff_df(a_id, b_id)
            .groupBy("change")
            .count()
            .collect()
        )
        by = {r["change"]: r["count"] for r in counts}
        d = Diff(
            chunks_written=by.get("added", 0) + by.get("updated", 0),
            chunks_deleted=by.get("deleted", 0),
        )
        a, b = fmt.read_snapshot(self.root, a_id), fmt.read_snapshot(self.root, b_id)
        a_nodes = {n["node_id"]: p for p, n in a.nodes.items()}
        b_nodes = {n["node_id"]: p for p, n in b.nodes.items()}
        d.new_nodes = sorted(b_nodes[i] for i in b_nodes.keys() - a_nodes.keys())
        d.deleted_nodes = sorted(a_nodes[i] for i in a_nodes.keys() - b_nodes.keys())
        d.updated_nodes = sorted(
            b_nodes[i]
            for i in a_nodes.keys() & b_nodes.keys()
            if a.nodes[a_nodes[i]] != b.nodes[b_nodes[i]] or a_nodes[i] != b_nodes[i]
        )
        return d

    def diff_df(self, from_snapshot_id: str, to_snapshot_id: str) -> DataFrame:
        """Chunk-level diff as a queryable DataFrame: one row per
        changed chunk with change ∈ {added, deleted, updated}.  A
        chunk's identity is its native chunk_id, virtual location, or
        inline-payload hash — whichever form it takes (no chunk file is
        ever read)."""
        a = fmt.read_snapshot(self.root, from_snapshot_id)
        b = fmt.read_snapshot(self.root, to_snapshot_id)

        def ident(df: DataFrame, side: str) -> DataFrame:
            # NB: concat_ws yields '' (not NULL) for all-null inputs,
            # which would stop coalesce early — gate on vpath instead
            identity = F.coalesce(
                F.col("chunk_id"),
                F.when(
                    F.col("vpath").isNotNull(),
                    F.concat_ws("@", "vpath", F.col("voffset").cast("string")),
                ),
                F.md5(F.col("inline")),
            )
            return df.select("node_id", "chunk_key", identity.alias(f"id_{side}"))

        ma = ident(mf.resolve_manifests(self.spark, self.root, a), "a")
        mb = ident(mf.resolve_manifests(self.spark, self.root, b), "b")
        j = ma.join(mb, ["node_id", "chunk_key"], "full_outer")
        change = (
            F.when(F.col("id_a").isNull(), "added")
            .when(F.col("id_b").isNull(), "deleted")
            .when(F.col("id_a") != F.col("id_b"), "updated")
        )
        return (
            j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select("change", "node_id", "chunk_key")
        )

    # --- maintenance ops (Spark jobs) -------------------------------------

    @_traced("icechunk.expire_snapshots")
    def expire_snapshots(
        self,
        older_than_seconds: "float | None" = None,
        now: float | None = None,
        *,
        older_than=None,
        delete_expired_branches: bool = False,
        delete_expired_tags: bool = False,
    ) -> set[str]:
        """Re-parent history so snapshots older than the cutoff (and not
        pointed to by any ref) become unreachable; returns the expired
        ids (design-docs/007-basic-expiration.md).  Files are reclaimed
        by garbage_collect.

        The cutoff is either ``older_than_seconds`` (age relative to
        ``now``) or ``older_than`` — an absolute ``datetime``, the
        reference's signature (repository.py:1715); naive datetimes are
        taken as UTC.

        With ``delete_expired_branches`` / ``delete_expired_tags`` (the
        reference's flags), refs other than main whose TIP falls behind
        the cutoff are themselves deleted along with their history."""
        now = time.time() if now is None else now
        cutoff = _resolve_cutoff(older_than_seconds, older_than, now, "expire_snapshots")
        # tips are pinned unless their ref is allowed to be deleted
        pinned = {fmt.branch_tip(self.root, MAIN)[1]}
        for b in self.list_branches():
            if b == MAIN or not delete_expired_branches:
                pinned.add(fmt.branch_tip(self.root, b)[1])
        for t in self.list_tags():
            if not delete_expired_tags:
                pinned.add(fmt.read_tag(self.root, t))
        expired: set[str] = set()
        # large histories: build the (id, parent, written_at, pruned)
        # graph with ONE executor-parallel read wave and reconstruct
        # each ref's chain in memory — the serial per-ref ancestry walk
        # costs O(history) driver round-trips per ref
        graph: dict[str, Any] | None = None
        metas = self._snapshot_meta_parallel(fmt.list_snapshot_ids(self.root))
        if metas is not None:
            from types import SimpleNamespace

            graph = {
                sid: SimpleNamespace(
                    id=sid,
                    parent_id=pid,
                    written_at=w,
                    pruned_ancestor_tx_logs=list(pr),
                )
                for sid, pid, _m, pr, w in metas
            }
        for ref_kind, names in (("branch", self.list_branches()), ("tag", self.list_tags())):
            for name in names:
                if graph is not None:
                    tip_id = (
                        fmt.branch_tip(self.root, name)[1]
                        if ref_kind == "branch"
                        else fmt.read_tag(self.root, name)
                    )
                    chain, cur = [], tip_id
                    while cur is not None:
                        node = graph.get(cur)
                        if node is None:
                            # tip moved (or graph is stale) — read fresh
                            # instead of KeyError-ing the whole expire
                            from types import SimpleNamespace

                            s = fmt.read_snapshot(self.root, cur)
                            node = SimpleNamespace(
                                id=s.id,
                                parent_id=s.parent_id,
                                written_at=s.written_at,
                                pruned_ancestor_tx_logs=list(s.pruned_ancestor_tx_logs),
                            )
                            graph[cur] = node
                        chain.append(node)
                        cur = node.parent_id
                else:
                    chain = list(
                        self.ancestry(branch=name)
                        if ref_kind == "branch"
                        else self.ancestry(tag=name)
                    )
                # root snapshot is never expired; walk upward from the
                # oldest non-root entry (tip included only when its ref
                # is deletable — otherwise it's pinned anyway)
                keep_up_to = len(chain) - 1
                for i in range(len(chain) - 2, -1, -1):
                    if chain[i].written_at < cutoff and chain[i].id not in pinned:
                        expired.add(chain[i].id)
                    else:
                        keep_up_to = i
                        break
                # re-parent the oldest kept snapshot onto the root.
                # chain[keep_up_to] IS the oldest kept (the walk broke
                # there); re-parenting anything newer would unlink a
                # non-expired snapshot from history and hand it to GC.
                if expired & {s.id for s in chain}:
                    oldest_kept = chain[keep_up_to]
                    root_snap = chain[-1]
                    if oldest_kept.id != root_snap.id and oldest_kept.id not in expired:
                        # the rewrite always starts from a FRESH read of
                        # the full doc: the graph may be a (stale)
                        # parallel snapshot, and a previous ref in this
                        # same call may already have re-parented this
                        # snapshot — union, never overwrite
                        fresh = fmt.read_snapshot(self.root, oldest_kept.id)
                        if fresh.parent_id != root_snap.id:
                            # design-doc 016: carry the txlog ids of every
                            # ancestor dropped from this path (oldest
                            # first, each preceded by its own carried
                            # list), so diff/rebase across the pruned gap
                            # stay exact and GC keeps those logs.
                            carried = list(fresh.pruned_ancestor_tx_logs)
                            for x in reversed(chain[keep_up_to + 1 : -1]):
                                carried.extend(x.pruned_ancestor_tx_logs)
                                carried.append(x.id)
                            fresh.pruned_ancestor_tx_logs = list(
                                dict.fromkeys(carried)
                            )
                            fresh.parent_id = root_snap.id
                            fmt.write_snapshot(self.root, fresh)
        if delete_expired_branches:
            for b in self.list_branches():
                if b != MAIN and fmt.branch_tip(self.root, b)[1] in expired:
                    fmt.delete_branch(self.root, b)
        if delete_expired_tags:
            for t in self.list_tags():
                if fmt.read_tag(self.root, t) in expired:
                    fmt.delete_tag(self.root, t)
        self._log_update({"type": "SnapshotsExpired", "n_expired": len(expired)})
        return expired

    # histories shorter than this read serially — executor round-trips
    # cost more than a handful of driver GETs
    _PARALLEL_SNAPSHOT_READ_MIN = 64
    # design-doc 011: max reachability recomputations when refs are
    # created concurrently with GC before the GC aborts
    _GC_MAX_RETRIES = 3

    def _gc_prevalidate_hook(self) -> None:
        """Test injection point: runs after reachability is computed and
        BEFORE the tips are re-verified / anything is deleted (no-op in
        production)."""

    def _storage_clock_skew(self) -> float:
        """Measured ``object-store clock − host clock`` in seconds:
        write a tiny probe object, read its storage mtime back, and
        compare against the host timestamp bracketing the put
        (reference PR #2310).  Storages that share the host clock
        (local fs, in-memory) measure ~0; a store that cannot take the
        probe (read-only, no timestamps) reports 0 — the pre-guard
        behavior, never worse."""
        import uuid

        st = fmt.resolve_storage(self.root)
        key = f"gc/clock-probe-{uuid.uuid4().hex}.json"
        try:
            t0 = time.time()
            st.put(key, b"{}")
            t1 = time.time()
            skew = st.mtime(key) - (t0 + t1) / 2.0
        except Exception:  # noqa: BLE001 — any probe failure means "unknown": use 0
            return 0.0
        finally:
            try:
                st.delete(key)
            except Exception:  # noqa: BLE001 — a leaked 2-byte probe is harmless
                pass
        return skew

    def _reap_paths(self, paths: list[str], cutoff: float, dry_run: bool) -> int:
        """Age-gated delete of a list of files/dirs, counting actual
        outcomes.  Large backlogs run per-candidate inside executor
        tasks (only the path NAMES ship); small or process-local repos
        loop on the driver."""

        def _one(path: str) -> int:
            from icechunk_spark.repo import fsio as _fsio

            ts = _fsio.mtime(path)
            if ts is None or ts >= cutoff:
                return 0
            return 1 if (dry_run or _fsio.delete_dir(path)) else 0

        if (
            not isinstance(self.root, str)
            or self.root.startswith("memory://")
            or len(paths) < self._PARALLEL_SNAPSHOT_READ_MIN
        ):
            return sum(_one(p) for p in paths)
        n_parts = max(1, min(len(paths) // 8, self.spark.sparkContext.defaultParallelism))
        return sum(self.spark.sparkContext.parallelize(paths, n_parts).map(_one).collect())

    def _snapshot_meta_parallel(
        self, ids: list[str], include_manifests: bool = False
    ) -> "list[tuple[str, str | None, list[str], list[str], float]] | None":
        """(id, parent_id, manifests, pruned_ancestor_tx_logs,
        written_at) for the given snapshot ids, read INSIDE executor
        tasks so a 10^5-commit history costs one parallel wave of
        object GETs instead of 10^5 serial driver round-trips (the r4
        GC-driver-bottleneck fix, applied to the snapshot plane).

        ``include_manifests=False`` (default) ships an empty manifests
        list — parent-graph callers must not pull every snapshot's
        split-manifest leaf paths onto the driver.  A snapshot deleted
        between LIST and read (concurrent GC from another driver)
        yields no tuple instead of failing the task.  Returns None when
        the root is not executor-readable (process-local memory://
        store) or the history is too small to be worth a Spark job."""
        root = self.root
        if (
            not isinstance(root, str)
            or root.startswith("memory://")
            or len(ids) < self._PARALLEL_SNAPSHOT_READ_MIN
        ):
            return None

        def _read(sid: str):
            from icechunk_spark.repo import format as _fmt

            try:
                s = _fmt.read_snapshot(root, sid)
            except (_fmt.RefError, FileNotFoundError, OSError):
                return None  # vanished between LIST and read
            return (
                s.id,
                s.parent_id,
                list(s.manifests) if include_manifests else [],
                list(s.pruned_ancestor_tx_logs),
                s.written_at,
            )

        n_parts = max(1, min(len(ids) // 8, self.spark.sparkContext.defaultParallelism))
        out = self.spark.sparkContext.parallelize(ids, n_parts).map(_read).collect()
        return [m for m in out if m is not None]

    def _ref_tips(self) -> list[str]:
        """Current snapshot ids of every branch and tag.  Read these
        BEFORE any snapshot listing/parallel wave: tips captured first
        are guaranteed present (snapshots are immutable and tips are
        never deleted), which closes the list-then-walk race window."""
        tips = [fmt.branch_tip(self.root, b)[1] for b in self.list_branches()]
        tips += [fmt.read_tag(self.root, t) for t in self.list_tags()]
        return tips

    def _walk_live(
        self, tips: list[str], parent: dict[str, "str | None"]
    ) -> set[str]:
        """BFS over the (possibly stale) parent graph; any id the graph
        does not know — a ref that moved after the graph was read — is
        resolved with a fresh driver read so reachability is NEVER
        truncated (truncation would hand live history to GC)."""
        live: set[str] = set()
        for tip in tips:
            cur: str | None = tip
            while cur is not None and cur not in live:
                live.add(cur)
                if cur in parent:
                    cur = parent[cur]
                else:
                    cur = fmt.read_snapshot(self.root, cur).parent_id
        return live

    def _reachable_snapshots(self) -> set[str]:
        """Snapshot ids reachable from any branch/tag.  Large histories
        build the parent graph with one executor-parallel read over ALL
        snapshot files, then walk it in memory; small/process-local
        repos fall back to the serial ref walk."""
        tips = self._ref_tips()  # before the listing — see _ref_tips
        ids = fmt.list_snapshot_ids(self.root)
        metas = self._snapshot_meta_parallel(ids)
        if metas is None:
            return set(self._parent_map().keys())
        parent = {sid: pid for sid, pid, _m, _p, _w in metas}
        return self._walk_live(tips, parent)

    @_traced("icechunk.garbage_collect")
    def garbage_collect(
        self,
        delete_object_older_than=None,
        *,
        dry_run: bool = False,
        older_than_seconds: "float | None" = None,
        now: float | None = None,
        max_snapshots_in_memory: int = 50,
        max_compressed_manifest_mem_bytes: int = 512 * 1024 * 1024,
        max_concurrent_manifest_fetches: int = 500,
    ) -> GCSummary:
        """Delete chunk files, manifests, txlogs and snapshots no longer
        reachable from any ref.  Chunk-file liveness is a Spark
        anti-join of the file listing against live manifest refs —
        never a driver-side chunk list (src/ops/gc.rs).  ``dry_run``
        counts what would be deleted without touching anything.

        Dry-run fidelity caveat: a real run shifts the age cutoff by a
        measured storage-clock skew (probe object, PR #2310), but
        ``dry_run`` must write nothing, so it evaluates ages against
        the UNSKEWED cutoff — on a store whose clock diverges from the
        host's, the preview counts can differ from what a real run
        would delete (candidates within ``|skew|`` of the cutoff flip).
        NTP-synced stores see ~0 divergence.

        Only objects *written before* the cutoff are touched —
        ``delete_object_older_than`` (an absolute ``datetime``, the
        reference's signature repository.py:1903) or
        ``older_than_seconds`` relative to ``now`` (default 24h):
        an in-flight write session puts chunk parquet into ``chunks/``
        while its manifest is still staged, so an un-aged GC would
        delete data a concurrent commit is about to reference.

        ``max_snapshots_in_memory`` / ``max_compressed_manifest_mem_bytes``
        / ``max_concurrent_manifest_fetches`` are accepted for reference
        signature compatibility but are advisory here: snapshots and
        manifests stream through Spark executor tasks, so driver memory
        never holds them regardless of these caps."""
        del max_snapshots_in_memory, max_compressed_manifest_mem_bytes
        del max_concurrent_manifest_fetches
        now = time.time() if now is None else now
        if delete_object_older_than is None and older_than_seconds is None:
            older_than_seconds = 24 * 3600.0
        cutoff = _resolve_cutoff(
            older_than_seconds, delete_object_older_than, now, "garbage_collect"
        )
        # Clock-skew guard (reference PR #2310): the cutoff above is a
        # HOST-clock instant, but every age check below compares
        # OBJECT-STORE mtimes.  A store clock running behind the host
        # makes freshly written objects look old enough to delete —
        # silently destroying in-flight chunks or still-referenced
        # txlogs.  Measure the skew with a probe object and shift the
        # cutoff into the storage-clock frame, so both sides of every
        # comparison use the SAME clock (the one that stamps deletes).
        # dry_run deletes nothing, so it must also WRITE nothing: skip
        # the probe (an audited/frozen store sees zero mutations).
        if not dry_run:
            cutoff += self._storage_clock_skew()

        def _old(path: str) -> bool:
            ts = fsio.mtime(path)
            # None = vanished concurrently / store without timestamps:
            # not ours to count
            return ts is not None and ts < cutoff

        summary = GCSummary()
        live_manifests: set[str] = set()
        # design-doc 016 retention rule: txlogs named in any live
        # snapshot's pruned_ancestor_tx_logs stay, even though their
        # snapshots are gone/going — diff/rebase across the expired
        # gap still read them.
        pruned_keep: set[str] = set()
        # ONE parallel wave (with manifests) serves both reachability
        # and the live-manifest/pruned-txlog collection.  Tips are read
        # BEFORE the listing (_ref_tips); any id the stale graph does
        # not know resolves with a fresh driver read — reachability is
        # never truncated (truncation would hand live history to GC).
        #
        # design-doc 011 (GC/expiration consistency): a branch or tag
        # CREATED while reachability is computed may point at a
        # snapshot the computed graph considers dead.  After computing
        # the live set, re-read every ref tip; if any tip is outside
        # it, RESTART the computation so the new ref's chain joins the
        # live set.  Bounded retries; exhausting them aborts the GC
        # (never delete a snapshot a ref now names).
        for _attempt in range(self._GC_MAX_RETRIES):
            live_manifests.clear()
            pruned_keep.clear()
            tips = self._ref_tips()
            metas = self._snapshot_meta_parallel(
                fmt.list_snapshot_ids(self.root), include_manifests=True
            )
            if metas is None:
                live_snaps = self._reachable_snapshots()
                for sid in live_snaps:
                    snap = fmt.read_snapshot(self.root, sid)
                    live_manifests.update(snap.manifests)
                    pruned_keep.update(snap.pruned_ancestor_tx_logs)
            else:
                info = {
                    sid: (pid, mans, pruned) for sid, pid, mans, pruned, _w in metas
                }
                live_snaps = set()
                for tip in tips:
                    cur: str | None = tip
                    while cur is not None and cur not in live_snaps:
                        live_snaps.add(cur)
                        if cur not in info:
                            s = fmt.read_snapshot(self.root, cur)
                            info[cur] = (
                                s.parent_id,
                                list(s.manifests),
                                list(s.pruned_ancestor_tx_logs),
                            )
                        cur = info[cur][0]
                for sid in live_snaps:
                    _pid, mans, pruned = info[sid]
                    live_manifests.update(mans)
                    pruned_keep.update(pruned)
            self._gc_prevalidate_hook()
            fresh_tips = self._ref_tips()
            if all(t in live_snaps for t in fresh_tips):
                break
        else:
            err = IcechunkError(
                f"garbage_collect aborted: refs moved onto snapshots outside "
                f"the computed live set in each of {self._GC_MAX_RETRIES} "
                "attempts; re-run when ref churn settles"
            )
            raise err

        def _old_snap(sid: str) -> bool:
            try:
                return fmt.snapshot_mtime(self.root, sid) < cutoff
            except (OSError, FileNotFoundError):
                return False

        # drop unreachable snapshots + their txlogs (counting actual
        # outcomes — a failed delete is not a reclaimed object).  Large
        # backlogs run the mtime-check + delete per-candidate INSIDE
        # executor tasks (only the candidate NAME list — already
        # driver-side — and two small sets ship in the closure); small
        # or process-local repos keep the serial loop.
        candidates = [s for s in fmt.list_snapshot_ids(self.root) if s not in live_snaps]
        parallel_ok = (
            isinstance(self.root, str)
            and not self.root.startswith("memory://")
            and len(candidates) >= self._PARALLEL_SNAPSHOT_READ_MIN
        )
        if parallel_ok:
            root, keep = self.root, frozenset(pruned_keep)
            txdir = _dp(self.root, "txlogs")

            def _reap(sid: str):
                from icechunk_spark.repo import format as _fmt
                from icechunk_spark.repo import fsio as _fsio

                snaps = logs = 0
                try:
                    if _fmt.snapshot_mtime(root, sid) >= cutoff:
                        return (0, 0)
                except (OSError, FileNotFoundError):
                    return (0, 0)
                if dry_run:
                    snaps = 1
                else:
                    try:
                        _fmt.delete_snapshot(root, sid)
                        snaps = 1
                    except OSError:
                        return (0, 0)
                if sid not in keep:
                    tx = f"{txdir}/{sid}.parquet"
                    if _fsio.exists(tx) and (dry_run or _fsio.delete_dir(tx)):
                        logs = 1
                return (snaps, logs)

            n_parts = max(1, min(len(candidates) // 8, self.spark.sparkContext.defaultParallelism))
            for snaps, logs in (
                self.spark.sparkContext.parallelize(candidates, n_parts).map(_reap).collect()
            ):
                summary.snapshots_deleted += snaps
                summary.txlogs_deleted += logs
        else:
            for sid in candidates:
                if _old_snap(sid):
                    if dry_run:
                        summary.snapshots_deleted += 1
                    else:
                        try:
                            fmt.delete_snapshot(self.root, sid)
                            summary.snapshots_deleted += 1
                        except OSError:
                            continue
                    if sid in pruned_keep:
                        continue  # txlog carried by a live boundary snapshot
                    tx = _dp(self.root, "txlogs", f"{sid}.parquet")
                    if fsio.exists(tx):
                        if dry_run or fsio.delete_dir(tx):
                            summary.txlogs_deleted += 1
        # orphan txlogs: their snapshot file is already gone (expired +
        # reclaimed in an earlier GC) so the loop above never sees them;
        # enumerate txlogs/ directly and apply the same keep rules.
        # Like the snapshot reap, large backlogs age-check + delete per
        # candidate inside executor tasks — the NAME list (already
        # driver-side) is all that ships.
        all_snap_ids = set(fmt.list_snapshot_ids(self.root))
        orphan_tx = [
            name
            for name in fsio.list_child_names(_dp(self.root, "txlogs"))
            if name.removesuffix(".parquet") not in live_snaps
            and name.removesuffix(".parquet") not in pruned_keep
            and name.removesuffix(".parquet") not in all_snap_ids
        ]
        summary.txlogs_deleted += self._reap_paths(
            [_dp(self.root, "txlogs", n) for n in orphan_tx], cutoff, dry_run
        )
        # drop unreferenced manifest files.  Liveness is a driver-side
        # set test on top-level NAMES (live_manifests is bounded by the
        # live snapshots' manifest lists, which GC already holds); the
        # age-check + delete of the dead ones parallelizes.
        mdir = _dp(self.root, "manifests")
        live_tops = {m.split("/", 2)[1] for m in live_manifests if m.startswith("manifests/")}
        dead = [
            f
            for f in fsio.list_child_names(mdir)
            if f not in live_tops
        ]
        summary.manifests_deleted += self._reap_paths(
            [_dp(self.root, "manifests", f) for f in dead], cutoff, dry_run
        )
        # Chunk files referenced by no live manifest.  The candidate set
        # is born DISTRIBUTED: one shallow LIST of chunks/ yields only
        # the 2-hex shard dirs (<=256 names, spec-v2 layout —
        # format.chunk_rel) plus any legacy pre-shard flat dirs; each
        # shard is then listed inside an executor task, so no collection
        # proportional to chunk-file count ever sits on the driver (at
        # ~10^8 refs / 100 TB the full name list is gigabytes).  A LIST
        # is still the source of truth — it sees zero-row or corrupt
        # chunk dirs a parquet scan would skip, which previously leaked
        # forever.  Liveness is a Spark anti-join; age-check + delete
        # run per partition through pyarrow.fs (no JVM in tasks).
        top_names = fsio.list_child_names(_dp(self.root, "chunks"))
        shard_names = [n for n in top_names if len(n) == 2]
        legacy_names = [n for n in top_names if len(n) != 2]
        data_root = fmt.data_path(self.root)
        if shard_names or legacy_names:
            sc = self.spark.sparkContext

            def list_shard(shard: str):
                from icechunk_spark.repo import fsio as _fsio

                base = f"{data_root.rstrip('/')}/chunks/{shard}"
                for name in _fsio.list_child_names(base):
                    yield (f"chunks/{shard}/{name}",)

            parts = max(1, min(32, len(shard_names)))
            sharded = sc.parallelize(shard_names, parts).flatMap(list_shard)
            all_files = self.spark.createDataFrame(sharded, "file string") if shard_names else None
            if legacy_names:
                legacy_df = local_df(
                    self.spark,
                    [{"file": f"chunks/{n}"} for n in legacy_names],
                    "file string",
                )
                all_files = legacy_df if all_files is None else all_files.union(legacy_df)
            if live_manifests:
                referenced = (
                    mf.read_manifest_files(self.spark, self.root, sorted(live_manifests))
                    .filter(F.col("file").isNotNull())
                    .select("file")
                    .distinct()
                )
                doomed = all_files.join(referenced, "file", "left_anti")
            else:
                doomed = all_files

            def delete_batch(rows):
                # runs inside executors: pyarrow fsio only, no JVM;
                # count actual outcomes, not attempts
                from icechunk_spark.repo import fsio as _fsio

                n = 0
                for r in rows:
                    full = f"{data_root.rstrip('/')}/{r['file']}"
                    ts = _fsio.mtime(full)
                    if ts is None or ts >= cutoff:
                        continue
                    if dry_run or _fsio.delete_dir(full):
                        n += 1
                yield n

            summary.chunk_files_deleted += int(
                sum(doomed.rdd.mapPartitions(delete_batch).collect())
            )
        # orphaned staging dirs (per-session: delete only aged ones —
        # a fresh staging dir belongs to a live write session)
        sdir = _dp(self.root, "staging")
        if not dry_run:
            for d in fsio.list_child_names(sdir):
                full = _dp(self.root, "staging", d)
                if _old(full):
                    fsio.delete_dir(full)
        if not dry_run:
            self._log_update(
                {
                    "type": "GarbageCollected",
                    "chunk_files_deleted": summary.chunk_files_deleted,
                    "snapshots_deleted": summary.snapshots_deleted,
                }
            )
        return summary

    @_traced("icechunk.rewrite_manifests")
    def rewrite_manifests(
        self,
        branch: str = MAIN,
        message: str = "rewrite manifests",
        *,
        metadata: dict | None = None,
        commit_method: str = "new_commit",
    ) -> str:
        """Compaction: collapse a snapshot's manifest list into one
        sorted, deduplicated manifest file and commit the result
        (src/ops/manifests.rs; design-docs/005).  Sorting by (node_id,
        c0..c3) makes subsequent slice reads scan contiguous row
        groups.  ``commit_method="amend"`` (reference
        repository.py:1819, types.CommitMethod) folds the rewrite into
        the CURRENT tip commit instead of adding a compaction commit —
        same history length, compacted layout."""
        if commit_method not in ("new_commit", "amend"):
            raise ValueError(f"invalid commit_method {commit_method!r}")
        gen, tip_id = fmt.branch_tip(self.root, branch)
        tip = fmt.read_snapshot(self.root, tip_id)
        # union-schema read (design-docs/015): a future writer's
        # additive nullable manifest columns ride through compaction
        # untouched instead of being dropped with their file
        resolved = mf.resolve_manifests(self.spark, self.root, tip, with_extra_columns=True)
        compacted = resolved.withColumn("seq", F.lit(0).cast("bigint")).sortWithinPartitions(
            "node_id", "c0", "c1", "c2", "c3"
        )
        cfg = self.config()
        splitting = cfg.manifest.splitting if cfg.manifest else None
        if splitting:
            # a repo configured with manifest splitting must stay split
            # through compaction (reference: rewrite_manifests honors
            # ManifestSplittingConfig, design-docs/005) — collapsing to
            # a monolith here would undo the layout the config asked for
            rels = mf.write_manifests(
                compacted,
                self.root,
                splitting=splitting,
                node_paths={n["node_id"]: p for p, n in tip.nodes.items()},
            )
        else:
            rels = [mf.write_manifest(compacted, self.root, n_files=cfg.manifest_split_files)]
        if commit_method == "amend" and tip.parent_id is None:
            raise RefError("cannot amend the root snapshot; use commit_method='new_commit'")
        if commit_method == "amend":
            # fold into the tip: same parent/seq/message (unless given),
            # new manifest list — history length unchanged
            snap = SnapshotInfo(
                id=new_id(),
                parent_id=tip.parent_id,
                message=message if message != "rewrite manifests" else tip.message,
                metadata={**tip.metadata, **(metadata or {}), "op": "rewrite_manifests"},
                written_at=time.time(),
                seq=tip.seq,
                manifests=rels,
                nodes=tip.nodes,
                pruned_ancestor_tx_logs=list(tip.pruned_ancestor_tx_logs),
                # design-docs/015: an amend REWRITES the tip — carry a
                # future writer's unknown fields through untouched
                extra=dict(tip.extra),
            )
        else:
            snap = SnapshotInfo(
                id=new_id(),
                parent_id=tip.id,
                message=message,
                metadata={**(metadata or {}), "op": "rewrite_manifests"},
                written_at=time.time(),
                seq=tip.seq + 1,
                manifests=rels,
                nodes=tip.nodes,
            )
        fmt.write_snapshot(self.root, snap)
        fmt.update_branch(self.root, branch, snap.id, expected_gen=gen)
        self._log_update({"type": "ManifestsRewritten", "branch": branch})
        return snap.id

    def chunk_storage_stats(
        self,
        snapshot_id: str | None = None,
        *,
        max_snapshots_in_memory: int = 50,
        max_compressed_manifest_mem_bytes: int = 512 * 1024 * 1024,
        max_concurrent_manifest_fetches: int = 500,
    ) -> DataFrame:
        """Per-node storage stats at a snapshot (Spark agg over the
        resolved manifest).  The max_* caps are advisory (reference
        signature compat): manifests stream through executor tasks, so
        driver memory never depends on them."""
        del max_snapshots_in_memory, max_compressed_manifest_mem_bytes
        del max_concurrent_manifest_fetches
        sid = snapshot_id or self.lookup_branch(MAIN)
        snap = fmt.read_snapshot(self.root, sid)
        resolved = mf.resolve_manifests(self.spark, self.root, snap)
        path_by_node = [(n["node_id"], p) for p, n in snap.nodes.items()]
        paths = local_df(self.spark, path_by_node, "node_id string, path string")
        return (
            resolved.groupBy("node_id")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum(F.coalesce(F.col("n_bytes"), F.lit(0))).alias("total_bytes"),
                F.sum(F.col("is_virtual").cast("int")).alias("n_virtual"),
            )
            .join(paths, "node_id", "left")
            .select("path", "node_id", "n_chunks", "total_bytes", "n_virtual")
            .orderBy("path")
        )

    def total_chunks_storage(self, snapshot_id: str | None = None, **advisory: int) -> int:
        df = self.chunk_storage_stats(snapshot_id, **advisory)
        row = df.agg(F.sum("total_bytes").alias("b")).collect()[0]
        return int(row["b"] or 0)
