"""icechunk_spark.repo — a Spark-first re-expression of the
earth-mover/icechunk transactional versioned chunk store.

Reference parity (see /root/reference):
- Repository / Session / store API surface: icechunk-python/python/
  icechunk/{repository.py, session.py, store.py}
- refs + commit CAS: icechunk/src/refs.rs (generation-file scheme)
- manifest-split / LSM-style manifests: design-docs/005-manifest-split.md
- conflicts + rebase: icechunk/src/conflicts/
- expiration + GC: design-docs/007-basic-expiration.md, src/ops/
- virtual chunk refs: icechunk/src/virtual_chunks.rs

Everything data-plane (commit materialization, manifest resolution,
diff, GC, compaction, stats, array encode/decode) is a Spark
DataFrame job over parquet; only tiny ref/snapshot JSON documents are
driver-side.
"""

from icechunk_spark.repo.format import (
    ArrayMeta,
    GroupMeta,
    RefError,
    SnapshotInfo,
)
from icechunk_spark.repo.repository import (
    CachingConfig,
    CompressionConfig,
    ManifestConfig,
    Repository,
    RepositoryConfig,
)
from icechunk_spark.repo.session import (
    ConflictError,
    ConflictSolver,
    Session,
    VersionSelector,
)
from icechunk_spark.repo.admin import (
    FeatureFlag,
    FeatureFlagDisabled,
    RepoAvailability,
    RepoStatus,
    Update,
)
from icechunk_spark.repo.migrations import (
    CURRENT_SPEC_VERSION,
    migrate_repository,
    spec_version_of,
)
from icechunk_spark.repo.store import ChunkStore
from icechunk_spark.repo import aio as _aio

# reference parity: the *_async twin surface (repository.py:157+,
# session.py:182+, store.py:116+) — generated once at import
_aio.install_async_twins(Repository, _aio.REPOSITORY_ASYNC)
_aio.install_async_twins(Session, _aio.SESSION_ASYNC)
_aio.install_async_twins(ChunkStore, _aio.STORE_ASYNC)


def supported_spec_versions() -> list[int]:
    """Spec versions this engine reads and writes, newest first
    (reference parity: icechunk.supported_spec_versions)."""
    return list(range(CURRENT_SPEC_VERSION, 0, -1))


class _InvalidatedRepository:
    """Sentinel replacing a Repository's internals after an in-place
    upgrade, preventing stale usage (reference parity:
    icechunk.__init__._InvalidatedRepository)."""

    def __getattr__(self, name: str) -> object:
        raise RuntimeError(
            "This repository has been invalidated by "
            "upgrade_icechunk_repository(). Use the new Repository "
            "object returned by that function instead."
        )


def upgrade_icechunk_repository(repo, *, dry_run: bool):
    """Migrate a repository to this engine's latest spec version and
    return a FRESH Repository handle; the old handle is invalidated
    (reference parity: icechunk.upgrade_icechunk_repository).  An
    administrative operation — run it in isolation from concurrent
    writers."""
    from icechunk_spark.repo.repository import Repository

    applied = migrate_repository(repo.root, dry_run=dry_run)
    if dry_run:
        return repo
    new_repo = Repository.open(repo.spark, repo.root)
    if applied:
        repo.__dict__.clear()
        repo.__class__ = _InvalidatedRepository  # type: ignore[assignment]
    return new_repo


from icechunk_spark.repo.storage import (  # noqa: E402
    InMemoryObjectStorage,
    LatencyStorage,
    LocalFilesystemStorage,
    LoggingStorage,
    Storage,
    StorageConflict,
    azure_storage,
    gcs_storage,
    in_memory_storage,
    local_filesystem_storage,
    r2_storage,
    resolve_storage,
    s3_storage,
    tigris_storage,
)

__all__ = [
    "ArrayMeta",
    "ConflictError",
    "ConflictSolver",
    "GroupMeta",
    "RefError",
    "Repository",
    "Session",
    "SnapshotInfo",
    "Storage",
    "StorageConflict",
    "LocalFilesystemStorage",
    "InMemoryObjectStorage",
    "resolve_storage",
    "VersionSelector",
    "RepositoryConfig",
    "CompressionConfig",
    "CachingConfig",
    "ManifestConfig",
    "RepoStatus",
    "RepoAvailability",
    "FeatureFlag",
    "FeatureFlagDisabled",
    "Update",
    "LoggingStorage",
    "LatencyStorage",
    "migrate_repository",
    "spec_version_of",
    "supported_spec_versions",
    "upgrade_icechunk_repository",
    "in_memory_storage",
    "local_filesystem_storage",
    "s3_storage",
    "tigris_storage",
    "r2_storage",
    "gcs_storage",
    "azure_storage",
]
