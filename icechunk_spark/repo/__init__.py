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
    migrate_repository,
    spec_version_of,
)
from icechunk_spark.repo.storage import (
    InMemoryObjectStorage,
    LatencyStorage,
    LocalFilesystemStorage,
    LoggingStorage,
    Storage,
    StorageConflict,
    resolve_storage,
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
]
