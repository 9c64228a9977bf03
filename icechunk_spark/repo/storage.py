"""Pluggable storage for the repo's metadata plane.

Mirrors the reference's ``Storage`` trait (icechunk/src/storage/mod.rs):
every backend provides write-once object puts, a conditional
create-if-absent put (the CAS primitive behind ref updates —
icechunk/src/refs.rs implements the same scheme with S3 If-None-Match /
conditional writes), listings, and deletes.  The BULK plane (chunk /
manifest / txlog parquet) always goes through Spark's Hadoop
filesystem layer via ``data_path()`` — pointing that at ``s3a://...``
is how the engine runs against a real bucket; the metadata plane below
is what must NOT assume a local filesystem.

Backends:
- ``LocalFilesystemStorage`` — json docs on disk; CAS via ``open(x)``.
- ``InMemoryObjectStorage`` — a process-local bucket emulation with
  true conditional-put semantics (atomic under a lock), modeled on the
  reference's in-memory storage used by its test fixtures
  (icechunk/src/storage/object_store.rs ``memory://``).  Bulk parquet
  lives in a scratch directory standing in for the bucket's data
  prefix, since Spark writes parquet through Hadoop, not through this
  class.  Single-process by design (like the reference's).

``resolve_storage`` maps a root string to a backend —
``memory://bucket[/prefix]`` or a plain path — so every existing
call site keeps passing ``self.root`` strings.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import time
import uuid

from icechunk_spark.repo.errbase import ErrorKind, IcechunkError


class StorageConflict(IcechunkError):
    """Conditional put failed: the object already exists."""

    default_kind = ErrorKind.CONFLICT.value


class CASUnsupported(IcechunkError):
    """The backend cannot provide an atomic conditional put for this
    scheme and the caller did not opt into ``single_writer=True``.
    Raised loudly at the first CAS attempt rather than silently
    degrading to exists-then-write (ADVICE r4: two concurrent
    committers could otherwise both win a branch CAS)."""

    default_kind = ErrorKind.STORAGE.value


class Storage:
    """Metadata-object API.  Keys are ``/``-separated relative paths
    (e.g. ``snapshots/<id>.json``); listings return child names."""

    root: str  # canonical root string (what the user passed)

    # -- metadata objects --------------------------------------------------
    def get(self, key: str) -> bytes:
        raise NotImplementedError

    def put(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def list_dir(self, prefix: str) -> list[str]:
        """Immediate child names under ``prefix`` (no recursion)."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError

    def mtime(self, key: str) -> float:
        raise NotImplementedError

    def getsize(self, key: str) -> int:
        return len(self.get(key))

    # -- bulk (Spark/Hadoop) plane ----------------------------------------
    @property
    def data_root(self) -> str:
        """Path/URI under which Spark reads and writes parquet."""
        raise NotImplementedError

    def data_path(self, rel: str) -> str:
        return os.path.join(self.data_root, rel)

    # -- convenience -------------------------------------------------------
    def get_json(self, key: str) -> dict:
        return json.loads(self.get(key).decode())

    def put_json(self, key: str, doc: dict, *, if_none_match: bool = False) -> None:
        self.put(key, json.dumps(doc).encode(), if_none_match=if_none_match)

    def put_json_cas(self, key: str, doc: dict) -> None:
        """Conditional create with lost-success recognition (reference
        PR #2156, design-docs/017-conditional-put-lost-response.md).

        A conditional write whose success response is lost in transit
        (connection drop, proxy timeout) is transparently retried by
        the object-store SDK; the retry's precondition then fails
        against OUR OWN first write and would surface as a spurious
        conflict ("tag already exists", parent mismatch).  Stamping a
        unique ``write_id`` into the payload and reading the object
        back when the precondition fails distinguishes "we actually
        won" from "someone else got there first"."""
        import uuid

        stamped = dict(doc)
        stamped["write_id"] = uuid.uuid4().hex
        try:
            self.put(key, json.dumps(stamped).encode(), if_none_match=True)
        except StorageConflict:
            try:
                existing = self.get_json(key)
            except Exception:  # noqa: BLE001 — unreadable loser stays a conflict
                raise StorageConflict(key) from None
            if existing.get("write_id") == stamped["write_id"]:
                return  # our write landed; only the response was lost
            raise


class LocalFilesystemStorage(Storage):
    def __init__(self, root: str):
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get(self, key: str) -> bytes:
        with open(self._p(key), "rb") as f:
            return f.read()

    def put(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if if_none_match:
            try:
                with open(path, "xb") as f:
                    f.write(data)
            except FileExistsError as e:
                raise StorageConflict(key) from e
            return
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def list_dir(self, prefix: str) -> list[str]:
        d = self._p(prefix)
        if not os.path.isdir(d):
            return []
        return sorted(os.listdir(d))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._p(key))
        except FileNotFoundError:
            pass

    def delete_prefix(self, prefix: str) -> None:
        shutil.rmtree(self._p(prefix), ignore_errors=True)

    def mtime(self, key: str) -> float:
        return os.path.getmtime(self._p(key))

    def getsize(self, key: str) -> int:
        return os.path.getsize(self._p(key))

    @property
    def data_root(self) -> str:
        return self.root


class InMemoryObjectStorage(Storage):
    """Bucket emulation: a dict of key -> (bytes, mtime) guarded by a
    lock, with genuine compare-and-set on conditional puts."""

    _BUCKETS: dict[str, tuple[dict[str, tuple[bytes, float]], threading.Lock]] = {}
    _REG_LOCK = threading.Lock()

    def __init__(self, bucket: str, prefix: str = ""):
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.root = f"memory://{bucket}" + (f"/{self.prefix}" if self.prefix else "")
        with self._REG_LOCK:
            if bucket not in self._BUCKETS:
                self._BUCKETS[bucket] = ({}, threading.Lock())
        self._objects, self._lock = self._BUCKETS[bucket]

    @classmethod
    def wipe_bucket(cls, bucket: str) -> None:
        with cls._REG_LOCK:
            cls._BUCKETS.pop(bucket, None)
        shutil.rmtree(cls._scratch_for(bucket), ignore_errors=True)

    @staticmethod
    def _scratch_for(bucket: str) -> str:
        return os.path.join(tempfile.gettempdir(), f"icechunk-membucket-{bucket}")

    def _k(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def get(self, key: str) -> bytes:
        with self._lock:
            try:
                return self._objects[self._k(key)][0]
            except KeyError:
                raise FileNotFoundError(key) from None

    def put(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        with self._lock:
            k = self._k(key)
            if if_none_match and k in self._objects:
                raise StorageConflict(key)
            self._objects[k] = (data, time.time())

    def exists(self, key: str) -> bool:
        with self._lock:
            return self._k(key) in self._objects

    def list_dir(self, prefix: str) -> list[str]:
        p = self._k(prefix).rstrip("/") + "/"
        names = set()
        with self._lock:
            for k in self._objects:
                if k.startswith(p):
                    names.add(k[len(p) :].split("/", 1)[0])
        return sorted(names)

    def delete(self, key: str) -> None:
        with self._lock:
            self._objects.pop(self._k(key), None)

    def delete_prefix(self, prefix: str) -> None:
        p = self._k(prefix).rstrip("/") + "/"
        with self._lock:
            for k in [k for k in self._objects if k.startswith(p)]:
                del self._objects[k]
        shutil.rmtree(self.data_path(prefix), ignore_errors=True)

    def mtime(self, key: str) -> float:
        with self._lock:
            try:
                return self._objects[self._k(key)][1]
            except KeyError:
                raise FileNotFoundError(key) from None

    @property
    def data_root(self) -> str:
        d = self._scratch_for(self.bucket)
        if self.prefix:
            d = os.path.join(d, self.prefix)
        os.makedirs(d, exist_ok=True)
        return d


class ArrowFsStorage(Storage):
    """Metadata plane over any pyarrow filesystem URI — ``s3://``,
    ``gs://``, ``hdfs://``, ``file://`` (``s3a://`` is normalized to
    ``s3://``).  Bulk parquet IO under the same root goes through
    Spark/Hadoop via ``data_root`` as usual, so one URI covers both
    planes — this is the backend that makes a cloud bucket a config
    change.

    Conditional-put (the CAS behind branch updates) is implemented
    per scheme, mirroring the reference (icechunk/src/storage/s3.rs;
    design-doc 017-conditional-put-lost-response.md):

    - ``file://`` — atomic ``O_CREAT|O_EXCL`` exclusive create.
    - ``s3://``/``s3a://`` — boto3 ``put_object(IfNoneMatch='*')``
      (public AWS conditional-write API, GA since 2024-11); MinIO/R2
      honor the same header.
    - ``gs://`` — google-cloud-storage ``if_generation_match=0``
      precondition.
    - ``abfs://``/``abfss://``/``az://`` — azure-storage-blob
      ``upload_blob(overwrite=False)`` (If-None-Match: * under the
      hood; ``ResourceExistsError`` = lost the race).
    - anything else (or the SDK missing) — there is NO atomic
      primitive, so the CAS raises :class:`CASUnsupported` unless the
      deployment explicitly opts into ``single_writer=True``, in which
      case a documented best-effort exists-then-write runs instead.
    """

    def __init__(self, root: str, *, single_writer: bool = False, fs=None, base: str | None = None):
        from pyarrow import fs as pafs

        self.root = root
        self.single_writer = single_writer
        uri = root
        if uri.startswith("s3a://"):
            uri = "s3://" + uri[len("s3a://") :]
        self._scheme = uri.split("://", 1)[0] if "://" in uri else "file"
        # forwarded to boto3 for the conditional-put path so the CAS
        # targets the SAME endpoint pyarrow reads/writes (MinIO / R2 /
        # Tigris); populated by the s3_storage factory
        self._s3_opts: dict[str, str] = {}
        # extra HTTP headers for auth proxies / CDN fronting (reference
        # storage.py read_headers/write_headers, 2.1.1 #2246) —
        # populated by the factories; injected on the SDK (boto3) CAS
        # plane per request method.  pyarrow's filesystems expose no
        # per-request header hook, so the bulk plane cannot carry them
        # — documented in s3_storage.
        self._read_headers: dict[str, str] = {}
        self._write_headers: dict[str, str] = {}
        if fs is not None:
            # pre-built filesystem (factory helpers: custom region /
            # endpoint / anonymous S3)
            self._fs, self._base = fs, base if base is not None else uri.split("://", 1)[1]
        else:
            self._fs, self._base = pafs.FileSystem.from_uri(uri)

    def _p(self, key: str) -> str:
        return f"{self._base.rstrip('/')}/{key}" if key else self._base

    def get(self, key: str) -> bytes:
        # when read headers are configured on an s3 root, metadata-plane
        # GETs route through the SDK (boto3) so the headers are actually
        # SENT — pyarrow has no per-request header hook, and a header-
        # requiring proxy would otherwise reject every read (#2246)
        if getattr(self, "_read_headers", None) and self._scheme == "s3":
            data = self._sdk_get(key)
            if data is not None:
                return data
        with self._fs.open_input_file(self._p(key)) as f:
            return f.read()

    def _sdk_get(self, key: str) -> "bytes | None":
        """boto3 GET with the configured header injection; None when
        boto3 is unavailable (caller falls back to pyarrow)."""
        try:
            import boto3
        except ImportError:
            return None
        bucket, obj = self._bucket_and_key(key)
        client = boto3.client("s3", **dict(self._s3_opts))
        self._register_header_injection(client)
        return client.get_object(Bucket=bucket, Key=obj)["Body"].read()

    # -- conditional put, per scheme --------------------------------------

    def _bucket_and_key(self, key: str) -> tuple[str, str]:
        """Split the pyarrow base path ``bucket/prefix`` + key into
        (bucket, object_key) for the native SDKs."""
        full = self._p(key).lstrip("/")
        bucket, _, obj = full.partition("/")
        return bucket, obj

    def _s3_conditional_put(self, key: str, data: bytes) -> bool:
        """True If-None-Match put via boto3; returns False when boto3
        is unavailable so the caller can decide the fallback."""
        try:
            import boto3
            import botocore.exceptions
        except ImportError:
            return False
        bucket, obj = self._bucket_and_key(key)
        opts = dict(self._s3_opts)
        refresh = getattr(self, "_s3_refresh", None)
        if refresh is not None:
            # refreshable credentials: re-fetch (the fetch() is cached
            # until expires_after) so the CAS plane never signs with an
            # expired STS token
            cred = refresh.fetch()
            opts["aws_access_key_id"] = cred.access_key_id
            opts["aws_secret_access_key"] = cred.secret_access_key
            if cred.session_token:
                opts["aws_session_token"] = cred.session_token
        client = boto3.client("s3", **opts)
        self._register_header_injection(client)
        try:
            client.put_object(Bucket=bucket, Key=obj, Body=data, IfNoneMatch="*")
        except botocore.exceptions.ClientError as e:
            code = e.response.get("Error", {}).get("Code", "")
            # 412 PreconditionFailed = lost the race; 409 is what some
            # S3-compatible stores return for the same condition.
            if code in ("PreconditionFailed", "412", "ConditionalRequestConflict", "409"):
                raise StorageConflict(key) from e
            raise
        return True

    def _register_header_injection(self, client) -> None:
        """Attach the factory-configured read/write headers to every
        request the boto3 client sends: write_headers on mutating
        methods (PUT/POST/DELETE), read_headers otherwise (GET/HEAD) —
        the reference's per-request-kind split (#2246)."""
        rh = dict(getattr(self, "_read_headers", {}) or {})
        wh = dict(getattr(self, "_write_headers", {}) or {})
        if not rh and not wh:
            return

        def _inject(request, **_kw):
            extra = wh if request.method in ("PUT", "POST", "DELETE") else rh
            for k, v in extra.items():
                request.headers[k] = v

        client.meta.events.register("before-send.s3", _inject)

    def _az_blob_client(self, container: str, blob: str):
        """A BlobClient for the CAS plane, or None when
        azure-storage-blob is unavailable.  Isolated so contract tests
        can substitute a fake service without the SDK installed."""
        try:
            from azure.storage.blob import BlobServiceClient
        except ImportError:
            return None
        opts = dict(getattr(self, "_az_opts", {}) or {})
        account = opts.get("account") or self._base.split("/", 1)[0]
        credential = opts.get("account_key") or opts.get("sas_token")
        if credential is None:
            try:
                from azure.identity import DefaultAzureCredential

                credential = DefaultAzureCredential()
            except ImportError:
                credential = None
        svc = BlobServiceClient(
            account_url=f"https://{account}.blob.core.windows.net",
            credential=credential,
        )
        return svc.get_blob_client(container=container, blob=blob)

    def _az_conditional_put(self, key: str, data: bytes) -> bool:
        """True conditional create on Azure Blob:
        ``upload_blob(..., overwrite=False)`` sends ``If-None-Match: *``
        and raises ``ResourceExistsError`` when the blob already exists
        — the same atomic primitive the reference relies on for Azure
        (icechunk/src/storage/object_store.rs conditional write).
        Returns False when the SDK is unavailable so the caller decides
        the fallback (CASUnsupported unless single_writer)."""
        container, obj = self._bucket_and_key(key)
        client = self._az_blob_client(container, obj)
        if client is None:
            return False
        try:
            client.upload_blob(data, overwrite=False)
        except Exception as e:  # noqa: BLE001 — mapped by exception name so
            # the contract holds with or without azure.core importable
            if type(e).__name__ == "ResourceExistsError":
                raise StorageConflict(key) from e
            raise
        return True

    def _gs_conditional_put(self, key: str, data: bytes) -> bool:
        try:
            from google.api_core import exceptions as gexc
            from google.cloud import storage as gcs
        except ImportError:
            return False
        bucket, obj = self._bucket_and_key(key)
        client = gcs.Client()
        # best-effort write-header injection (#2246): the GCS SDK has no
        # public per-request hook, but its transport is a requests
        # Session whose default headers apply to every call this client
        # makes (writes only here — this client exists solely for the
        # conditional put)
        wh = dict(getattr(self, "_write_headers", {}) or {})
        if wh:
            try:
                client._http.headers.update(wh)
            except Exception:  # noqa: BLE001 — transport without a Session: headers skipped
                pass
        blob = client.bucket(bucket).blob(obj)
        try:
            blob.upload_from_string(data, if_generation_match=0)
        except gexc.PreconditionFailed as e:
            raise StorageConflict(key) from e
        return True

    def _local_exclusive_put(self, key: str, data: bytes) -> None:
        path = self._p(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise StorageConflict(key) from e
        with os.fdopen(fd, "wb") as f:
            f.write(data)

    def put(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        if if_none_match:
            if self._scheme == "file":
                return self._local_exclusive_put(key, data)
            if self._scheme == "s3" and self._s3_conditional_put(key, data):
                return
            elif self._scheme == "gs" and self._gs_conditional_put(key, data):
                return
            elif self._scheme in ("abfs", "abfss", "az") and self._az_conditional_put(
                key, data
            ):
                return
            if not self.single_writer:
                raise CASUnsupported(
                    f"no atomic conditional put for scheme {self._scheme!r} "
                    f"(SDK missing or unsupported); pass single_writer=True "
                    f"(or root='...?single_writer=true') to accept "
                    f"best-effort exists-then-write semantics"
                )
            if self.exists(key):
                raise StorageConflict(key)
        path = self._p(key)
        parent = path.rsplit("/", 1)[0]
        self._fs.create_dir(parent, recursive=True)
        with self._fs.open_output_stream(path) as f:
            f.write(data)

    def exists(self, key: str) -> bool:
        from pyarrow import fs as pafs

        return self._fs.get_file_info(self._p(key)).type != pafs.FileType.NotFound

    def list_dir(self, prefix: str) -> list[str]:
        from pyarrow import fs as pafs

        try:
            infos = self._fs.get_file_info(
                pafs.FileSelector(self._p(prefix), recursive=False)
            )
        except (FileNotFoundError, OSError):
            return []
        return sorted(i.base_name for i in infos)

    def delete(self, key: str) -> None:
        try:
            self._fs.delete_file(self._p(key))
        except (FileNotFoundError, OSError):
            pass

    def delete_prefix(self, prefix: str) -> None:
        try:
            self._fs.delete_dir(self._p(prefix))
        except (FileNotFoundError, OSError):
            pass

    def mtime(self, key: str) -> float:
        from pyarrow import fs as pafs

        info = self._fs.get_file_info(self._p(key))
        if info.type == pafs.FileType.NotFound or info.mtime is None:
            raise FileNotFoundError(key)
        return info.mtime.timestamp()

    def getsize(self, key: str) -> int:
        info = self._fs.get_file_info(self._p(key))
        if info.size is None:
            raise FileNotFoundError(key)
        return info.size

    @property
    def data_root(self) -> str:
        # Spark reads/writes through Hadoop with the ORIGINAL scheme
        # (s3a:// for S3 on Hadoop), so hand back the root untouched.
        return self.root


class _DelegatingStorage(Storage):
    """Base for observability wrappers: forwards every Storage call to
    ``inner`` through ``_observe`` (reference parity: the reference
    wraps its Storage in latency/logging decorators —
    icechunk/src/storage/latency.rs, logging.rs)."""

    def __init__(self, inner: Storage):
        self.inner = inner
        self.root = inner.root

    def _observe(self, op: str, key: str, fn):
        return fn()

    def get(self, key: str) -> bytes:
        return self._observe("get", key, lambda: self.inner.get(key))

    def put(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        return self._observe(
            "put", key, lambda: self.inner.put(key, data, if_none_match=if_none_match)
        )

    def exists(self, key: str) -> bool:
        return self._observe("exists", key, lambda: self.inner.exists(key))

    def list_dir(self, prefix: str) -> list[str]:
        return self._observe("list_dir", prefix, lambda: self.inner.list_dir(prefix))

    def delete(self, key: str) -> None:
        return self._observe("delete", key, lambda: self.inner.delete(key))

    def delete_prefix(self, prefix: str) -> None:
        return self._observe(
            "delete_prefix", prefix, lambda: self.inner.delete_prefix(prefix)
        )

    def mtime(self, key: str) -> float:
        return self._observe("mtime", key, lambda: self.inner.mtime(key))

    def getsize(self, key: str) -> int:
        return self._observe("getsize", key, lambda: self.inner.getsize(key))

    @property
    def data_root(self) -> str:
        return self.inner.data_root


class LoggingStorage(_DelegatingStorage):
    """Log every metadata-plane operation (op, key, elapsed ms) through
    ``log_fn`` (default: print to stderr)."""

    def __init__(self, inner: Storage, log_fn=None):
        super().__init__(inner)
        if log_fn is None:
            import sys

            def log_fn(line: str) -> None:  # pragma: no cover - default sink
                print(line, file=sys.stderr)

        self._log = log_fn

    def _observe(self, op: str, key: str, fn):
        t0 = time.perf_counter()
        try:
            return fn()
        finally:
            ms = (time.perf_counter() - t0) * 1000.0
            self._log(f"storage {op} {key} {ms:.2f}ms")


class LatencyStorage(_DelegatingStorage):
    """Accumulate per-op latency statistics; ``stats()`` returns
    {op: {count, total_s, max_s}} for dashboards/tests."""

    def __init__(self, inner: Storage):
        super().__init__(inner)
        self._stats: dict[str, dict[str, float]] = {}

    def _observe(self, op: str, key: str, fn):
        t0 = time.perf_counter()
        try:
            return fn()
        finally:
            dt = time.perf_counter() - t0
            s = self._stats.setdefault(op, {"count": 0, "total_s": 0.0, "max_s": 0.0})
            s["count"] += 1
            s["total_s"] += dt
            s["max_s"] = max(s["max_s"], dt)

    def stats(self) -> dict[str, dict[str, float]]:
        return {op: dict(s) for op, s in self._stats.items()}


# --- factory helpers (reference parity: icechunk/storage.py ---------------
# in_memory_storage / local_filesystem_storage / s3_storage /
# tigris_storage / r2_storage / gcs_storage)


def in_memory_storage() -> Storage:
    """A fresh private in-memory bucket (reference parity:
    icechunk.in_memory_storage — each call is an independent store)."""
    return InMemoryObjectStorage(f"mem-{uuid.uuid4().hex[:12]}")


def local_filesystem_storage(path: str) -> Storage:
    return LocalFilesystemStorage(path)


def s3_storage(
    bucket: str,
    prefix: str = "",
    *,
    region: str | None = None,
    endpoint_url: str | None = None,
    anonymous: bool = False,
    single_writer: bool = False,
    access_key_id: str | None = None,
    secret_access_key: str | None = None,
    session_token: str | None = None,
    credentials: object | None = None,
    allow_http: bool = False,
    force_path_style: bool = False,
    read_headers: dict[str, str] | None = None,
    write_headers: dict[str, str] | None = None,
    headers: dict[str, str] | None = None,
) -> Storage:
    """S3 (or any S3-compatible endpoint) metadata-plane storage.
    Credentials default to the environment/instance profile, matching
    the reference's from_env default (icechunk/storage.py:182); static
    keys may be passed directly (reference s3_storage kwargs) or as a
    ``credentials.S3Credentials.*`` object.  The same keys feed both
    pyarrow's S3FileSystem (bulk plane) and the boto3 conditional-put
    client (branch-CAS plane) so the two planes can never target
    different identities.

    ``read_headers`` / ``write_headers`` / ``headers`` (reference
    storage.py:202-343, 2.1.1 #2246): extra HTTP headers for
    deployments fronting the bucket with an auth proxy or CDN —
    ``headers`` applies to both kinds, the read/write variants take
    precedence per key.  They are injected per-request on the SDK
    (boto3) CAS plane; pyarrow's S3FileSystem exposes no per-request
    header hook, so the bulk plane cannot carry them (a proxy that
    REQUIRES them on reads needs the http_storage front instead)."""
    refreshable = None
    if credentials is not None:
        from icechunk_spark.credentials import S3Credentials

        if isinstance(credentials, S3Credentials.Anonymous):
            anonymous = True
        elif isinstance(credentials, S3Credentials.Static):
            access_key_id = credentials.credentials.access_key_id
            secret_access_key = credentials.credentials.secret_access_key
            session_token = credentials.credentials.session_token
        elif isinstance(credentials, S3Credentials.Refreshable):
            # seed the pyarrow fs with the current token; keep the
            # refreshable handle so the boto3 CAS plane re-fetches
            # after expiry (a rebuilt pyarrow fs needs a new
            # s3_storage call — pyarrow has no refresh hook)
            refreshable = credentials
            cred = credentials.fetch()
            access_key_id = cred.access_key_id
            secret_access_key = cred.secret_access_key
            session_token = cred.session_token
        # FromEnv: nothing to do — the default chain applies
    root = f"s3://{bucket}" + (f"/{prefix.strip('/')}" if prefix else "")
    s3_opts: dict[str, str] = {}
    if region:
        s3_opts["region_name"] = region
    if endpoint_url:
        s3_opts["endpoint_url"] = endpoint_url
    if access_key_id:
        s3_opts["aws_access_key_id"] = access_key_id
    if secret_access_key:
        s3_opts["aws_secret_access_key"] = secret_access_key
    if session_token:
        s3_opts["aws_session_token"] = session_token
    eff_read = {**(headers or {}), **(read_headers or {})}
    eff_write = {**(headers or {}), **(write_headers or {})}
    if not s3_opts and not anonymous and not allow_http and not force_path_style:
        st = ArrowFsStorage(root, single_writer=single_writer)
        st._read_headers, st._write_headers = eff_read, eff_write
        return st
    from pyarrow import fs as pafs

    fs = pafs.S3FileSystem(
        region=region,
        endpoint_override=endpoint_url,
        anonymous=anonymous,
        access_key=access_key_id,
        secret_key=secret_access_key,
        session_token=session_token,
        scheme="http" if allow_http else None,
        force_virtual_addressing=False if force_path_style else None,
    )
    st = ArrowFsStorage(root, single_writer=single_writer, fs=fs)
    st._s3_opts = s3_opts
    st._s3_refresh = refreshable
    st._read_headers, st._write_headers = eff_read, eff_write
    return st


def tigris_storage(bucket: str, prefix: str = "", **kw) -> Storage:
    """Tigris is S3-compatible (reference design-docs/009): same path
    with the public Tigris endpoint as the default."""
    kw.setdefault("endpoint_url", "https://t3.storage.dev")
    return s3_storage(bucket, prefix, **kw)


def r2_storage(
    bucket: str, prefix: str = "", *, account_id: str | None = None, **kw
) -> Storage:
    """Cloudflare R2 via its S3-compatible endpoint."""
    if account_id and "endpoint_url" not in kw:
        kw["endpoint_url"] = f"https://{account_id}.r2.cloudflarestorage.com"
    return s3_storage(bucket, prefix, **kw)


def gcs_storage(
    bucket: str,
    prefix: str = "",
    *,
    single_writer: bool = False,
    read_headers: dict[str, str] | None = None,
    write_headers: dict[str, str] | None = None,
    headers: dict[str, str] | None = None,
) -> Storage:
    """GCS metadata-plane storage.  ``read_headers`` / ``write_headers``
    / ``headers`` follow the reference's semantics (#2246, see
    s3_storage).  Honest scope: write headers are injected best-effort
    on the google-cloud-storage CAS client's transport session; read
    headers have no SDK read path on gs:// today, and pyarrow's
    GcsFileSystem has no per-request header hook — a read-proxied GCS
    deployment needs the http_storage front."""
    root = f"gs://{bucket}" + (f"/{prefix.strip('/')}" if prefix else "")
    st = ArrowFsStorage(root, single_writer=single_writer)
    st._read_headers = {**(headers or {}), **(read_headers or {})}
    st._write_headers = {**(headers or {}), **(write_headers or {})}
    return st


def azure_storage(
    account: str,
    container: str,
    prefix: str = "",
    *,
    single_writer: bool = False,
    account_key: str | None = None,
    sas_token: str | None = None,
    credentials: object | None = None,
) -> Storage:
    """Azure Blob metadata-plane storage via pyarrow's AzureFileSystem
    (reference parity: icechunk.azure_storage).  Bulk-plane credentials
    come from the environment (DefaultAzureCredential chain); the
    branch-CAS plane uses azure-storage-blob
    ``upload_blob(overwrite=False)`` — a true atomic conditional create
    — with the same account identity (account_key / sas_token if given,
    else DefaultAzureCredential)."""
    from pyarrow import fs as pafs

    if credentials is not None:
        from icechunk_spark.credentials import AzureCredentials

        if isinstance(credentials, AzureCredentials.Static):
            inner = credentials.credentials
            account_key = getattr(inner, "account_key", None) or account_key
            sas_token = getattr(inner, "sas_token", None) or sas_token
    fs_kwargs = {"account_name": account}
    if account_key:
        fs_kwargs["account_key"] = account_key
    fs = pafs.AzureFileSystem(**fs_kwargs)
    base = f"{container}" + (f"/{prefix.strip('/')}" if prefix else "")
    root = f"abfs://{account}/{base}"
    st = ArrowFsStorage(root, single_writer=single_writer, fs=fs, base=base)
    st._scheme = "abfs"
    st._az_opts = {"account": account}
    if account_key:
        st._az_opts["account_key"] = account_key
    if sas_token:
        st._az_opts["sas_token"] = sas_token
    return st


def resolve_storage(root: "str | Storage") -> Storage:
    if isinstance(root, Storage):
        return root
    if root.startswith("memory://"):
        rest = root[len("memory://") :]
        bucket, _, prefix = rest.partition("/")
        return InMemoryObjectStorage(bucket, prefix)
    if "://" in root:  # any pyarrow filesystem URI (s3/s3a/gs/hdfs/file)
        single_writer = False
        if "?" in root:
            root, _, query = root.partition("?")
            single_writer = "single_writer=true" in query.lower()
        return ArrowFsStorage(root, single_writer=single_writer)
    return LocalFilesystemStorage(root)


class HttpReadOnlyStorage(Storage):
    """Read-only metadata plane over a plain HTTP(S) server (reference
    parity: icechunk.http_storage — icechunk-python storage.py:77-97;
    the Rust side is object_store's HTTP backend).

    ``get``/``exists``/``getsize``/``mtime`` are real HTTP requests via
    stdlib urllib (no extra SDK); every mutation raises
    :class:`~icechunk_spark.errors.ReadOnlyError` since plain HTTP has
    no atomic put.  Listing is only possible when the server exposes a
    directory index — not guaranteed — so ``list_dir`` raises a typed
    capability error rather than silently returning [].  The bulk
    plane (``data_root``) serves Spark reads through the same base
    URL; Spark's Hadoop http support or a mounted gateway must be
    present for parquet scans, which matches the reference's
    "read-only repos published over HTTP" use case.
    """

    def __init__(self, base_url: str, opts: dict | None = None, headers: dict | None = None):
        self.root = base_url.rstrip("/")
        self._opts = dict(opts or {})
        self._headers = dict(headers or {})

    def _url(self, key: str) -> str:
        return f"{self.root}/{key.lstrip('/')}"

    def _request(self, key: str, method: str = "GET") -> "object":
        import urllib.request

        req = urllib.request.Request(self._url(key), method=method, headers=self._headers)
        return urllib.request.urlopen(req, timeout=float(self._opts.get("timeout", 30)))

    def get(self, key: str) -> bytes:
        import urllib.error

        try:
            with self._request(key) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(key) from e
            raise

    def exists(self, key: str) -> bool:
        import urllib.error

        try:
            with self._request(key, "HEAD"):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            if e.code == 405:
                # HEAD disabled on this server: 405 says nothing about
                # the KEY, so disambiguate with a GET (a Range GET
                # keeps the transfer tiny on servers that honor it)
                try:
                    import urllib.request

                    req = urllib.request.Request(
                        self._url(key),
                        headers={**self._headers, "Range": "bytes=0-0"},
                    )
                    with urllib.request.urlopen(req, timeout=float(self._opts.get("timeout", 30))):
                        return True
                except urllib.error.HTTPError as e2:
                    if e2.code == 404:
                        return False
                    raise
            raise
        except OSError:
            return False

    def getsize(self, key: str) -> int:
        with self._request(key, "HEAD") as resp:
            cl = resp.headers.get("Content-Length")
            return int(cl) if cl is not None else len(self.get(key))

    def mtime(self, key: str) -> float:
        from email.utils import parsedate_to_datetime

        with self._request(key, "HEAD") as resp:
            lm = resp.headers.get("Last-Modified")
            return parsedate_to_datetime(lm).timestamp() if lm else 0.0

    def _read_only(self, *_a, **_k):
        from icechunk_spark.errors import ReadOnlyError

        raise ReadOnlyError("http storage is read-only (reference parity: http_storage)")

    put = _read_only
    delete = _read_only
    delete_prefix = _read_only

    def list_dir(self, prefix: str) -> list[str]:
        raise NotImplementedError(
            "plain HTTP cannot list; serve an index or use an object-store scheme"
        )

    @property
    def data_root(self) -> str:
        return self.root


def http_storage(
    base_url: str,
    opts: dict | None = None,
    headers: dict | None = None,
) -> Storage:
    """Read-only storage over HTTP(S) (reference parity:
    icechunk.http_storage).  ``headers`` are injected into every
    request (e.g. ``{"authorization": "Bearer <token>"}``)."""
    return HttpReadOnlyStorage(base_url, opts, headers)


#: Terminal redirect schemes that mean "serve this URL over plain
#: HTTP(S)": the ``+icechunk``/``+ic`` tag exists so a redirect
#: service can mark an http(s) Location as FINAL (plain http(s)
#: Locations keep being followed).  Reference parity:
#: icechunk/src/storage/redirect.rs:46-55 HANDLED_SCHEMES and the
#: scheme-stripping arm at redirect.rs:211-221 (#2262).
_HTTP_TAGGED_SCHEMES = (
    "http+icechunk://",
    "http+ic://",
    "https+icechunk://",
    "https+ic://",
)


def _strip_icechunk_scheme(url: str) -> str | None:
    """``http+icechunk://host/p`` -> ``http://host/p`` (None if the
    URL carries no +icechunk/+ic tag)."""
    for tagged in _HTTP_TAGGED_SCHEMES:
        if url.startswith(tagged):
            base = tagged.split("+", 1)[0]
            return base + "://" + url[len(tagged):]
    return None


def redirect_storage(base_url: str) -> Storage:
    """Follow HTTP redirects from ``base_url`` until a recognized
    storage scheme appears, then open THAT as the real backend
    (reference parity: icechunk.redirect_storage — a service decides
    where the repo lives; clients just hold one stable URL).

    ``http+icechunk://`` / ``http+ic://`` (and https twins) mark a
    TERMINAL http(s) location: the tag is stripped and the result
    served read-only over HTTP — both as the ``base_url`` itself and
    as a redirect target (redirect.rs:211-221, #2262)."""
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    url = base_url
    for _ in range(10):  # redirect-chain bound
        stripped = _strip_icechunk_scheme(url)
        if stripped is not None:
            return http_storage(stripped)
        if not url.startswith(("http://", "https://")):
            return resolve_storage(url)
        try:
            resp = opener.open(urllib.request.Request(url, method="HEAD"), timeout=30)
            resp.close()
            # 2xx with no redirect: the URL itself is the final location
            return http_storage(url)
        except urllib.error.HTTPError as e:
            loc = e.headers.get("Location") if 300 <= e.code < 400 else None
            if loc is None:
                raise
            if "://" not in loc:
                # RFC 7231 permits relative Location headers — resolve
                # against the current URL, never treat as a local path
                from urllib.parse import urljoin

                loc = urljoin(url, loc)
            url = loc
    raise RuntimeError(f"redirect chain from {base_url} did not terminate in 10 hops")


def local_filesystem_store(path: str):
    """ObjectStoreConfig for a local-filesystem container (reference
    parity: icechunk.local_filesystem_store)."""
    from icechunk_spark.types import ObjectStoreConfig

    return ObjectStoreConfig.LocalFileSystem(path)


def http_store(opts: dict | None = None, headers: dict | None = None):
    """ObjectStoreConfig for an HTTP container (reference parity)."""
    from icechunk_spark.types import ObjectStoreConfig

    return ObjectStoreConfig.Http(opts, headers)


def s3_store(
    region: str | None = None,
    endpoint_url: str | None = None,
    allow_http: bool = False,
    anonymous: bool = False,
    s3_compatible: bool = False,
    force_path_style: bool = False,
    network_stream_timeout_seconds: int = 60,
    requester_pays: bool = False,
    checksum_algorithm=None,
):
    """ObjectStoreConfig for S3 / S3-compatible containers (reference
    parity: icechunk.s3_store)."""
    from icechunk_spark.types import ObjectStoreConfig, S3Options

    options = S3Options(
        region=region,
        endpoint_url=endpoint_url,
        allow_http=allow_http,
        anonymous=anonymous,
        force_path_style=force_path_style,
        network_stream_timeout_seconds=network_stream_timeout_seconds,
        requester_pays=requester_pays,
        checksum_algorithm=checksum_algorithm,
    )
    return (
        ObjectStoreConfig.S3Compatible(options)
        if s3_compatible
        else ObjectStoreConfig.S3(options)
    )


def gcs_store(opts: dict | None = None):
    """ObjectStoreConfig for GCS containers (reference parity)."""
    from icechunk_spark.types import ObjectStoreConfig

    return ObjectStoreConfig.Gcs(opts)
