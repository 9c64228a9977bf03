"""icechunk_spark — a PySpark-native rebuild of the capabilities of
earth-mover/icechunk (transactional, versioned chunk storage) plus the
analytics / LLM-data-pipeline operator layer that runs on top of it.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, parquet for all data-plane state, Pandas UDFs only where the
built-in operators genuinely cannot express the semantics.

The top-level namespace mirrors the reference's public API
(icechunk-python/python/icechunk/__init__.py ``__all__``) so a
reference user's imports work unchanged:

    from icechunk_spark import (
        Repository, s3_storage, BasicConflictSolver, VersionSelection,
    )

The ecosystem glue modules mirror the reference's too:
``icechunk_spark.distributed`` (merge_sessions / extract_session),
``icechunk_spark.xarray`` (to_icechunk over coordinate-rows
DataFrames), ``icechunk_spark.dask`` (store_dask over ForkSessions),
and the ``*_async`` twin surface on Repository / Session / ChunkStore
(repo/aio.py — asyncio.to_thread wrappers awaiting to the sync
results).  Out-of-scope reference names (deliberate, documented): the
JS bindings and the flatbuffers binary format.
"""

from icechunk_spark.engine import get_spark
from icechunk_spark.catalog import load_tables

# --- versioned repo core ---------------------------------------------------
from icechunk_spark.repo.repository import (
    CachingConfig,
    CompressionConfig,
    GCSummary,
    ManifestConfig,
    Repository,
    RepositoryConfig,
)
from icechunk_spark.repo.session import (
    ChunkType,
    Diff,
    ForkSession,
    Session,
    SessionMode,
    VersionSelector,
)
from icechunk_spark.repo.store import ChunkStore
from icechunk_spark.repo.store import ChunkStore as IcechunkStore
from icechunk_spark.repo.format import ArrayMeta, GroupMeta, SnapshotInfo
from icechunk_spark.repo.admin import (
    FeatureFlag,
    FeatureFlagDisabled,
    RepoAvailability,
    RepoStatus,
)
from icechunk_spark.repo import (
    supported_spec_versions,
    upgrade_icechunk_repository,
)
from icechunk_spark.repo.migrations import CURRENT_SPEC_VERSION, migrate_repository

# --- storage ---------------------------------------------------------------
from icechunk_spark.repo.storage import (
    ArrowFsStorage,
    CASUnsupported,
    InMemoryObjectStorage,
    LatencyStorage,
    LocalFilesystemStorage,
    LoggingStorage,
    Storage,
    StorageConflict,
    azure_storage,
    gcs_storage,
    gcs_store,
    http_storage,
    http_store,
    in_memory_storage,
    local_filesystem_storage,
    local_filesystem_store,
    r2_storage,
    redirect_storage,
    resolve_storage,
    s3_storage,
    s3_store,
    tigris_storage,
)

# --- errors ----------------------------------------------------------------
from icechunk_spark.errors import (
    AlreadyExistsError,
    ConflictError,
    ErrorKind,
    FormatError,
    IcechunkError,
    InternalError,
    InvalidInputError,
    NodeNotFoundError,
    NotFoundError,
    ReadOnlyError,
    RebaseFailedError,
    RefNotFoundError,
    RepositoryNotFoundError,
    SessionStateError,
    SnapshotNotFoundError,
    StorageError,
)

# --- conflicts -------------------------------------------------------------
from icechunk_spark.conflicts import (
    BasicConflictSolver,
    Conflict,
    ConflictDetector,
    ConflictSolver,
    ConflictType,
    VersionSelection,
    conflicts_of,
)

# --- credentials -----------------------------------------------------------
from icechunk_spark.credentials import (
    AnyAzureCredential,
    AnyAzureStaticCredential,
    AnyCredential,
    AnyGcsCredential,
    AnyGcsStaticCredential,
    AnyS3Credential,
    AzureCredentials,
    AzureRefreshableCredential,
    AzureStaticCredentials,
    Credentials,
    GcsBearerCredential,
    GcsCredentials,
    GcsStaticCredentials,
    HttpAccess,
    LocalFileSystemAccess,
    S3Credentials,
    S3StaticCredentials,
    azure_anonymous_credentials,
    azure_credentials,
    azure_from_env_credentials,
    azure_refreshable_credentials,
    azure_static_credentials,
    containers_credentials,
    gcs_anonymous_credentials,
    gcs_credentials,
    gcs_from_env_credentials,
    gcs_refreshable_credentials,
    gcs_static_credentials,
    s3_anonymous_credentials,
    s3_credentials,
    s3_from_env_credentials,
    s3_refreshable_credentials,
    s3_static_credentials,
)

# --- config/value types ----------------------------------------------------
from icechunk_spark.types import (
    AnyObjectStoreConfig,
    ChecksumAlgorithm,
    CommitMethod,
    CompressionAlgorithm,
    ManifestFileInfo,
    ManifestPreloadCondition,
    ManifestPreloadConfig,
    ManifestSplitCondition,
    ManifestSplitDimCondition,
    ManifestSplittingConfig,
    ManifestVirtualChunkLocationCompressionConfig,
    ObjectStoreConfig,
    S3Options,
    SpecVersion,
    StorageConcurrencySettings,
    StorageRetriesSettings,
    StorageSettings,
    StorageTimeoutSettings,
    VirtualChunkContainer,
    VirtualChunkSpec,
)

# --- snapshots / ops log ---------------------------------------------------
from icechunk_spark.snapshots import AncestryGraph
from icechunk_spark.ops import GCSummary as _GCSummary  # noqa: F401 (same object)
from icechunk_spark.ops import Update, UpdateType

__version__ = "0.2.0"


def spec_version() -> int:
    """The newest on-disk spec version this engine writes
    (reference parity: icechunk.spec_version)."""
    return int(CURRENT_SPEC_VERSION)


def initialize_logs(level: str = "WARN") -> None:
    """Configure the engine's Python logging (reference parity:
    icechunk.initialize_logs; the reference wires Rust tracing — here
    it is stdlib logging for the ``icechunk_spark`` namespace)."""
    import logging

    logging.basicConfig()
    logging.getLogger("icechunk_spark").setLevel(level)


def set_logs_filter(log_filter_directive: str | None) -> None:
    """Adjust log verbosity at runtime (reference parity:
    icechunk.set_logs_filter).  Accepts a level name, or
    ``module=level`` directives separated by commas."""
    import logging

    for part in (log_filter_directive or "WARN").split(","):
        name, _, lvl = part.rpartition("=")
        logging.getLogger(name or "icechunk_spark").setLevel(lvl.upper() or "WARN")


def shutdown_telemetry() -> None:
    """Reference-parity no-op: this engine emits no telemetry, so
    there is nothing to flush (the reference flushes its OTLP
    exporter here)."""


def user_agent() -> str:
    """Identifier sent by storage clients (reference parity:
    icechunk.user_agent)."""
    return f"icechunk_spark/{__version__}"


def print_debug_info() -> None:
    """Environment report for bug reports (reference parity:
    icechunk.print_debug_info)."""
    import platform
    from importlib import import_module

    print(f"platform:  {platform.platform()}")
    print(f"python:  {platform.python_version()}")
    print(f"icechunk_spark:  {__version__}")
    for package in ["pyspark", "pyarrow", "pandas", "numpy", "duckdb"]:
        try:
            print(f"{package}:  {import_module(package).__version__}")
        except ModuleNotFoundError:
            continue


__all__ = [
    "__version__",  # the reference exports it from __init__ too
    # engine entry points
    "get_spark",
    "load_tables",
    # repo core
    "ArrayMeta",
    "ArrowFsStorage",
    "CachingConfig",
    "ChunkStore",
    "ChunkType",
    "CompressionConfig",
    "CURRENT_SPEC_VERSION",
    "Diff",
    "ForkSession",
    "GCSummary",
    "GroupMeta",
    "IcechunkStore",
    "InMemoryObjectStorage",
    "LatencyStorage",
    "LocalFilesystemStorage",
    "LoggingStorage",
    "ManifestConfig",
    "Repository",
    "RepositoryConfig",
    "Session",
    "SessionMode",
    "SnapshotInfo",
    "Storage",
    "VersionSelector",
    "migrate_repository",
    "resolve_storage",
    "supported_spec_versions",
    "upgrade_icechunk_repository",
    # admin
    "FeatureFlag",
    "FeatureFlagDisabled",
    "RepoAvailability",
    "RepoStatus",
    "Update",
    "UpdateType",
    # errors
    "AlreadyExistsError",
    "CASUnsupported",
    "ConflictError",
    "ErrorKind",
    "FormatError",
    "IcechunkError",
    "InternalError",
    "InvalidInputError",
    "NodeNotFoundError",
    "NotFoundError",
    "ReadOnlyError",
    "RebaseFailedError",
    "RefNotFoundError",
    "RepositoryNotFoundError",
    "SessionStateError",
    "SnapshotNotFoundError",
    "StorageConflict",
    "StorageError",
    # conflicts
    "BasicConflictSolver",
    "Conflict",
    "ConflictDetector",
    "ConflictSolver",
    "ConflictType",
    "VersionSelection",
    "conflicts_of",
    # credentials
    "AnyAzureCredential",
    "AnyAzureStaticCredential",
    "AnyCredential",
    "AnyGcsCredential",
    "AnyGcsStaticCredential",
    "AnyS3Credential",
    "AzureCredentials",
    "AzureRefreshableCredential",
    "AzureStaticCredentials",
    "Credentials",
    "GcsBearerCredential",
    "GcsCredentials",
    "GcsStaticCredentials",
    "HttpAccess",
    "LocalFileSystemAccess",
    "S3Credentials",
    "S3StaticCredentials",
    "azure_anonymous_credentials",
    "azure_credentials",
    "azure_from_env_credentials",
    "azure_refreshable_credentials",
    "azure_static_credentials",
    "containers_credentials",
    "gcs_anonymous_credentials",
    "gcs_credentials",
    "gcs_from_env_credentials",
    "gcs_refreshable_credentials",
    "gcs_static_credentials",
    "s3_anonymous_credentials",
    "s3_credentials",
    "s3_from_env_credentials",
    "s3_refreshable_credentials",
    "s3_static_credentials",
    # types
    "AnyObjectStoreConfig",
    "ChecksumAlgorithm",
    "CommitMethod",
    "CompressionAlgorithm",
    "ManifestFileInfo",
    "ManifestPreloadCondition",
    "ManifestPreloadConfig",
    "ManifestSplitCondition",
    "ManifestSplitDimCondition",
    "ManifestSplittingConfig",
    "ManifestVirtualChunkLocationCompressionConfig",
    "ObjectStoreConfig",
    "S3Options",
    "SpecVersion",
    "StorageConcurrencySettings",
    "StorageRetriesSettings",
    "StorageSettings",
    "StorageTimeoutSettings",
    "VirtualChunkContainer",
    "VirtualChunkSpec",
    # storage factories
    "azure_storage",
    "gcs_storage",
    "gcs_store",
    "http_storage",
    "http_store",
    "in_memory_storage",
    "local_filesystem_storage",
    "local_filesystem_store",
    "r2_storage",
    "redirect_storage",
    "s3_storage",
    "s3_store",
    "tigris_storage",
    # snapshots / misc
    "AncestryGraph",
    "initialize_logs",
    "print_debug_info",
    "set_logs_filter",
    "shutdown_telemetry",
    "spec_version",
    "user_agent",
]
