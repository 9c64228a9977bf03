"""Storage-backend contract tests (icechunk/src/storage/mod.rs is the
reference trait; refs.rs's conditional-write CAS is the critical
semantic).  Both backends must behave identically for every metadata
operation format.py performs."""

from __future__ import annotations

import uuid

import pytest

from icechunk_spark.repo import (
    InMemoryObjectStorage,
    LocalFilesystemStorage,
    Repository,
    StorageConflict,
    resolve_storage,
)
from icechunk_spark.repo.storage import ArrowFsStorage


@pytest.fixture(params=["local", "memory", "arrowfs"])
def storage(request, tmp_path):
    if request.param == "memory":
        bucket = f"s{uuid.uuid4().hex[:8]}"
        yield InMemoryObjectStorage(bucket, "repo")
        InMemoryObjectStorage.wipe_bucket(bucket)
    elif request.param == "arrowfs":
        # the URI backend exercised through pyarrow's local filesystem;
        # s3://gs://hdfs:// take the same code path
        yield ArrowFsStorage(f"file://{tmp_path}/repo")
    else:
        yield LocalFilesystemStorage(str(tmp_path / "repo"))


def test_put_get_roundtrip(storage):
    storage.put("a/b.json", b"{}")
    assert storage.get("a/b.json") == b"{}"
    assert storage.exists("a/b.json")
    assert not storage.exists("a/c.json")
    assert storage.getsize("a/b.json") == 2


def test_conditional_put_is_cas(storage):
    storage.put("refs/x.json", b"1", if_none_match=True)
    with pytest.raises(StorageConflict):
        storage.put("refs/x.json", b"2", if_none_match=True)
    # loser must not have clobbered the winner
    assert storage.get("refs/x.json") == b"1"
    # unconditional put still overwrites
    storage.put("refs/x.json", b"3")
    assert storage.get("refs/x.json") == b"3"


def test_list_dir_children_only(storage):
    storage.put("refs/branch.main/0000000000.json", b"{}")
    storage.put("refs/branch.dev/0000000000.json", b"{}")
    storage.put("refs/tag.v1/ref.json", b"{}")
    names = storage.list_dir("refs")
    assert "branch.main" in names and "branch.dev" in names and "tag.v1" in names
    assert storage.list_dir("refs/branch.main") == ["0000000000.json"]
    assert storage.list_dir("nope") == []


def test_delete_and_delete_prefix(storage):
    storage.put("snapshots/a.json", b"{}")
    storage.put("refs/tag.v1/ref.json", b"{}")
    storage.delete("snapshots/a.json")
    assert not storage.exists("snapshots/a.json")
    storage.delete_prefix("refs/tag.v1")
    assert storage.list_dir("refs/tag.v1") == []


def test_mtime_monotone(storage):
    storage.put("a.json", b"1")
    t1 = storage.mtime("a.json")
    storage.put("a.json", b"2")
    assert storage.mtime("a.json") >= t1


def test_resolve_storage_schemes(tmp_path):
    local = resolve_storage(str(tmp_path))
    assert isinstance(local, LocalFilesystemStorage)
    mem = resolve_storage("memory://bkt/prefix/x")
    assert isinstance(mem, InMemoryObjectStorage)
    assert mem.bucket == "bkt" and mem.prefix == "prefix/x"
    # a Storage instance passes through
    assert resolve_storage(local) is local
    InMemoryObjectStorage.wipe_bucket("bkt")


def test_resolve_storage_uri_scheme(tmp_path):
    s = resolve_storage(f"file://{tmp_path}/r")
    assert isinstance(s, ArrowFsStorage)
    assert s.data_root == f"file://{tmp_path}/r"


def test_repo_lifecycle_over_uri_root(spark, tmp_path):
    """Full create → commit → read → GC cycle with a URI root: the
    metadata plane runs through ArrowFsStorage, the bulk plane through
    Spark/Hadoop and fsio — no os.* anywhere in between (the s3a://
    claim, demonstrated on file://)."""
    root = f"file://{tmp_path}/repo"
    repo = Repository.create(spark, root)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"u" * 4096)
    with repo.transaction(message="v2") as s:
        s.set_chunk_bytes("/a", "1", b"v" * 4096)
    sess = repo.readonly_session()
    assert sess.get_chunk_bytes("/a", "0") == b"u" * 4096
    assert sess.chunk_type("/a", (1,)).name == "native"
    assert [s.message for s in repo.ancestry(branch="main")][:2] == ["v2", "init"]
    repo.rewrite_manifests()
    # expire pre-compaction history, then GC reclaims its manifests
    repo.expire_snapshots(older_than_seconds=0.0)
    summary = repo.garbage_collect(older_than_seconds=-1)
    assert summary.manifests_deleted >= 1
    assert repo.readonly_session().get_chunk_bytes("/a", "1") == b"v" * 4096


def test_memory_repo_commit_race_cas(spark):
    """Two sessions racing to commit on the same branch: exactly one
    CAS wins per generation, and both commits land (the loser rebases
    and retries)."""
    bucket = f"r{uuid.uuid4().hex[:8]}"
    root = f"memory://{bucket}/repo"
    repo = Repository.create(spark, root)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.create_array("/b", shape=[8], chunk_shape=[4])

    s1 = repo.writable_session("main")
    s2 = repo.writable_session("main")
    s1.set_chunk_bytes("/a", "0", b"x" * 32)
    s2.set_chunk_bytes("/b", "0", b"y" * 32)
    id1 = s1.commit("write a")
    id2 = s2.commit("write b")  # detects the moved tip, rebases, retries CAS
    assert id1 != id2
    chain = [s.id for s in repo.ancestry(branch="main")]
    assert chain[0] == id2 and chain[1] == id1
    sess = repo.readonly_session()
    assert sess.get_chunk_bytes("/a", "0") == b"x" * 32
    assert sess.get_chunk_bytes("/b", "0") == b"y" * 32
    InMemoryObjectStorage.wipe_bucket(bucket)


def test_concurrent_commit_stress(spark):
    """Many writers racing on one branch: every commit must land
    (CAS + rebase retry), history must be linear and complete, and
    every write must be readable at the tip."""
    from concurrent.futures import ThreadPoolExecutor

    bucket = f"c{uuid.uuid4().hex[:8]}"
    repo = Repository.create(spark, f"memory://{bucket}/repo")
    n_writers, n_commits = 4, 2
    with repo.transaction(message="init") as s:
        for w in range(n_writers):
            s.create_array(f"/w{w}", shape=[64], chunk_shape=[8])

    def writer(w: int) -> list[str]:
        out = []
        for i in range(n_commits):
            sess = repo.writable_session("main")
            sess.set_chunk_bytes(f"/w{w}", str(i), bytes([w * 16 + i]) * 16)
            out.append(sess.commit(f"w{w}-c{i}"))
        return out

    with ThreadPoolExecutor(max_workers=n_writers) as pool:
        ids = [i for ids in pool.map(writer, range(n_writers)) for i in ids]

    chain = [s.id for s in repo.ancestry(branch="main")]
    assert len(set(ids)) == n_writers * n_commits
    assert set(ids) <= set(chain), "a successful commit is missing from history"
    sess = repo.readonly_session()
    for w in range(n_writers):
        for i in range(n_commits):
            assert sess.get_chunk_bytes(f"/w{w}", str(i)) == bytes([w * 16 + i]) * 16
    InMemoryObjectStorage.wipe_bucket(bucket)


def test_racing_conditional_puts_one_winner(storage):
    """Contract: N threads racing put(if_none_match=True) on one key
    yield exactly one winner on EVERY backend (ADVICE r4: the CAS the
    branch commit protocol rests on must be atomic, not
    exists-then-write)."""
    from concurrent.futures import ThreadPoolExecutor

    def attempt(i: int) -> bool:
        try:
            storage.put("refs/race.json", b"%d" % i, if_none_match=True)
            return True
        except StorageConflict:
            return False

    with ThreadPoolExecutor(max_workers=8) as pool:
        wins = list(pool.map(attempt, range(8)))
    assert sum(wins) == 1
    winner = wins.index(True)
    assert storage.get("refs/race.json") == b"%d" % winner


def test_arrowfs_cas_unsupported_scheme_fails_loudly(tmp_path):
    """A scheme with no atomic primitive must refuse the CAS instead of
    silently degrading (storage.py CASUnsupported)."""
    from icechunk_spark.repo.storage import CASUnsupported

    st = ArrowFsStorage(f"file://{tmp_path}/r")
    st._scheme = "hdfs"  # simulate a scheme with no conditional-put SDK
    with pytest.raises(CASUnsupported):
        st.put("refs/x.json", b"1", if_none_match=True)
    # explicit opt-in restores the documented best-effort behavior
    st.single_writer = True
    st.put("refs/x.json", b"1", if_none_match=True)
    with pytest.raises(StorageConflict):
        st.put("refs/x.json", b"2", if_none_match=True)
    assert st.get("refs/x.json") == b"1"


def test_arrowfs_s3_conditional_put_via_boto3(tmp_path, monkeypatch):
    """The s3 path issues a true IfNoneMatch='*' put through boto3 and
    maps PreconditionFailed to StorageConflict (reference parity:
    icechunk/src/storage/s3.rs conditional write; AWS conditional-put
    GA 2024-11)."""
    import boto3
    import botocore.exceptions

    calls = []

    class FakeS3:
        def put_object(self, *, Bucket, Key, Body, IfNoneMatch):
            calls.append((Bucket, Key, bytes(Body), IfNoneMatch))
            if len(calls) > 1:
                raise botocore.exceptions.ClientError(
                    {"Error": {"Code": "PreconditionFailed"}}, "PutObject"
                )

    monkeypatch.setattr(boto3, "client", lambda svc: FakeS3())
    st = ArrowFsStorage(f"file://{tmp_path}/bucket/repo")
    st._scheme = "s3"
    st.put("refs/y.json", b"1", if_none_match=True)
    with pytest.raises(StorageConflict):
        st.put("refs/y.json", b"2", if_none_match=True)
    assert [c[3] for c in calls] == ["*", "*"]
    # bucket/key split: first path component is the bucket
    assert calls[0][1].endswith("repo/refs/y.json")


def test_resolve_storage_single_writer_query(tmp_path):
    st = resolve_storage(f"file://{tmp_path}/q?single_writer=true")
    assert isinstance(st, ArrowFsStorage) and st.single_writer
    assert st.root == f"file://{tmp_path}/q"
    st2 = resolve_storage(f"file://{tmp_path}/q2")
    assert not st2.single_writer


def test_storage_factory_helpers(tmp_path, spark):
    """Reference-parity factories (icechunk/storage.py):
    in_memory_storage / local_filesystem_storage / s3_storage /
    tigris_storage / r2_storage / gcs_storage — and a Repository
    works directly over a Storage INSTANCE, like the reference's
    Repository.create(storage)."""
    from icechunk_spark.repo import (
        in_memory_storage,
        local_filesystem_storage,
        r2_storage,
        s3_storage,
        tigris_storage,
    )

    # each in-memory factory call is an independent store
    m1, m2 = in_memory_storage(), in_memory_storage()
    m1.put("a.json", b"1")
    assert not m2.exists("a.json")

    lf = local_filesystem_storage(str(tmp_path / "lf"))
    lf.put("a.json", b"2")
    assert lf.get("a.json") == b"2"

    s3 = s3_storage("bkt", "pre/fix", region="us-east-1", anonymous=True)
    assert s3.root == "s3://bkt/pre/fix" and s3._scheme == "s3"
    tg = tigris_storage("bkt", anonymous=True)
    assert tg._scheme == "s3"
    r2 = r2_storage("bkt", account_id="acct", anonymous=True)
    assert r2._scheme == "s3"

    # Repository over a Storage instance (not a root string)
    repo = Repository.create(spark, in_memory_storage())
    with repo.transaction(message="w") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"z" * 4096)
    assert repo.readonly_session().get_chunk_bytes("/a", "0") == b"z" * 4096
    assert repo.list_branches() == {"main"} or "main" in repo.list_branches()


def test_azure_storage_factory_constructs():
    """azure_storage builds an ArrowFsStorage over pyarrow's
    AzureFileSystem without touching the network; the CAS for abfs has
    no atomic primitive, so it must demand single_writer."""
    from icechunk_spark.repo import azure_storage
    from icechunk_spark.repo.storage import CASUnsupported

    st = azure_storage("acct", "cont", "pre")
    assert st.root == "abfs://acct/cont/pre" and st._scheme == "abfs"
    with pytest.raises(CASUnsupported):
        st.put("refs/x.json", b"1", if_none_match=True)


def test_s3_conditional_put_targets_custom_endpoint(tmp_path, monkeypatch):
    """The boto3 CAS must hit the SAME endpoint pyarrow reads from —
    a MinIO/R2/Tigris repo whose conditional put silently targeted AWS
    would break commit safety."""
    import boto3

    from icechunk_spark.repo.storage import s3_storage

    seen = {}

    class FakeS3:
        def put_object(self, **kw):
            seen["put"] = kw

    def fake_client(svc, **kw):
        seen["client_kwargs"] = kw
        return FakeS3()

    monkeypatch.setattr(boto3, "client", fake_client)
    st = s3_storage("bkt", "repo", endpoint_url="https://minio.local:9000", region="us-west-2", anonymous=True)
    st.put("refs/z.json", b"1", if_none_match=True)
    assert seen["client_kwargs"] == {
        "endpoint_url": "https://minio.local:9000",
        "region_name": "us-west-2",
    }
    assert seen["put"]["IfNoneMatch"] == "*" and seen["put"]["Bucket"] == "bkt"


class _FakeAzureService:
    """In-memory stand-in for azure-storage-blob's conditional create:
    upload_blob(overwrite=False) raises ResourceExistsError (by NAME —
    the SDK is not in this container) when the blob exists, atomically
    under a lock like the real service's If-None-Match: *."""

    def __init__(self):
        import threading

        self.blobs: dict[tuple[str, str], bytes] = {}
        self.lock = threading.Lock()

    def client(self, container: str, blob: str):
        svc = self

        class ResourceExistsError(Exception):
            pass

        class FakeBlobClient:
            def upload_blob(self, data, overwrite=False):
                with svc.lock:
                    if not overwrite and (container, blob) in svc.blobs:
                        raise ResourceExistsError(blob)
                    svc.blobs[(container, blob)] = bytes(data)

        return FakeBlobClient()


def test_azure_conditional_put_maps_conflict(tmp_path):
    """The abfs path issues upload_blob(overwrite=False) and maps
    ResourceExistsError to StorageConflict (reference parity: Azure
    conditional write in icechunk/src/storage/object_store.rs)."""
    svc = _FakeAzureService()
    st = ArrowFsStorage(f"file://{tmp_path}/cont/repo")
    st._scheme = "abfs"
    st._base = "cont/repo"  # what azure_storage sets: container/prefix
    st._az_blob_client = svc.client
    st.put("refs/x.json", b"1", if_none_match=True)
    with pytest.raises(StorageConflict):
        st.put("refs/x.json", b"2", if_none_match=True)
    # winner not clobbered; container/key split took the first path part
    assert svc.blobs[("cont", "repo/refs/x.json")] == b"1"


def test_azure_racing_conditional_puts_one_winner(tmp_path):
    """The same racing-put contract every other CAS backend passes."""
    from concurrent.futures import ThreadPoolExecutor

    svc = _FakeAzureService()
    st = ArrowFsStorage(f"file://{tmp_path}/cont/repo")
    st._scheme = "abfs"
    st._base = "cont/repo"
    st._az_blob_client = svc.client

    def attempt(i: int) -> bool:
        try:
            st.put("refs/race.json", b"%d" % i, if_none_match=True)
            return True
        except StorageConflict:
            return False

    with ThreadPoolExecutor(max_workers=8) as pool:
        wins = list(pool.map(attempt, range(8)))
    assert sum(wins) == 1
    assert svc.blobs[("cont", "repo/refs/race.json")] == b"%d" % wins.index(True)


def test_azure_storage_no_longer_requires_single_writer(monkeypatch):
    """azure_storage(...) has a real CAS plane: with the SDK present
    (faked here) a conditional put succeeds without single_writer."""
    from icechunk_spark.repo import azure_storage

    svc = _FakeAzureService()
    st = azure_storage("acct", "cont", "pre", account_key="k")
    assert st._az_opts["account"] == "acct" and st._az_opts["account_key"] == "k"
    monkeypatch.setattr(st, "_az_blob_client", svc.client)
    st.put("refs/x.json", b"1", if_none_match=True)
    with pytest.raises(StorageConflict):
        st.put("refs/x.json", b"2", if_none_match=True)
    assert svc.blobs[("cont", "pre/refs/x.json")] == b"1"


# ---------------------------------------------------------------------------
# lost-success conditional writes (reference PR #2156,
# design-docs/017-conditional-put-lost-response.md): a CAS whose success
# response is lost in transit must be RECOGNIZED as a success on the
# retry's precondition failure, not surface as a spurious conflict.
# ---------------------------------------------------------------------------


from icechunk_spark.repo.storage import _DelegatingStorage


class _LostResponseStorage(_DelegatingStorage):
    """Fault injector over any Storage: every conditional put LANDS,
    but the success response is 'lost' — the caller observes exactly
    what an SDK-internal retry would surface (a precondition failure
    against our own write).  LatencyStorage-style delegation."""

    def __init__(self, inner):
        super().__init__(inner)
        self.lost = 0

    def put(self, key, data, *, if_none_match=False):
        self.inner.put(key, data, if_none_match=if_none_match)
        if if_none_match:
            self.lost += 1
            raise StorageConflict(key)


def test_put_json_cas_recognizes_lost_success(storage):
    faulty = _LostResponseStorage(storage)
    faulty.put_json_cas("refs/tag.v1/ref.json", {"snapshot_id": "abc"})
    assert faulty.lost == 1  # the conflict fired and was recognized
    assert storage.get_json("refs/tag.v1/ref.json")["snapshot_id"] == "abc"

    # a REAL conflict (someone else's write id) still raises
    with pytest.raises(StorageConflict):
        faulty.put_json_cas("refs/tag.v1/ref.json", {"snapshot_id": "other"})
    assert storage.get_json("refs/tag.v1/ref.json")["snapshot_id"] == "abc"


def test_commit_and_tag_survive_lost_cas_responses(spark, tmp_path):
    """End-to-end: every ref-plane CAS in a commit + tag + branch
    create goes through the fault injector and still succeeds."""
    inner = LocalFilesystemStorage(str(tmp_path / "lostrepo"))
    faulty = _LostResponseStorage(inner)
    repo = Repository.create(spark, faulty)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[4], chunk_shape=[2])
    repo.create_tag("v1", repo.lookup_branch("main"))
    repo.create_branch("dev", repo.lookup_branch("main"))
    assert faulty.lost >= 3  # create + commit + tag + branch all CAS'd
    assert repo.lookup_tag("v1") == repo.lookup_branch("main")
