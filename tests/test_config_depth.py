"""RepositoryConfig depth: compression, caching, manifest preload,
commit retry bound, partial-values concurrency (reference parity:
icechunk-python RepositoryConfig + CompressionConfig + CachingConfig +
ManifestConfig + RepoUpdateRetryConfig)."""

from __future__ import annotations

import pytest

from icechunk_spark.repo import (
    CachingConfig,
    CompressionConfig,
    ManifestConfig,
    RefError,
    Repository,
    RepositoryConfig,
)
from icechunk_spark.repo import format as fmt


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"))


def _write_array(repo, spark, msg="v"):
    with repo.transaction(message=msg) as s:
        if "/a" not in s.list_nodes():
            s.create_array("/a", shape=[8], chunk_shape=[4])
        s.write_array_df(
            "/a", spark.range(8).selectExpr("id AS i0", "CAST(id AS DOUBLE) AS value")
        )


def test_config_nested_roundtrip(spark, repo):
    cfg = RepositoryConfig(
        compression=CompressionConfig(algorithm="zlib", level=6),
        caching=CachingConfig(num_chunk_refs=1000),
        manifest=ManifestConfig(preload_paths=["/a"]),
        repo_update_retries=3,
        get_partial_values_concurrency=4,
    )
    repo.save_config(cfg)
    got = Repository.open(spark, repo.root).config()
    assert got.compression.algorithm == "zlib" and got.compression.level == 6
    assert got.caching.num_chunk_refs == 1000
    assert got.manifest.preload_paths == ["/a"]
    assert got.repo_update_retries == 3
    assert got.get_partial_values_concurrency == 4


def test_snapshot_compression_and_mixed_read(spark, repo, tmp_path):
    _write_array(repo, spark, "uncompressed era")
    plain_snap = repo.lookup_branch("main")
    # raw doc on disk is plain JSON
    raw = open(tmp_path / "repo" / "snapshots" / f"{plain_snap}.json", "rb").read()
    assert raw[:1] == b"{"

    repo.save_config(RepositoryConfig(compression=CompressionConfig(algorithm="zlib")))
    _write_array(repo, spark, "compressed era")
    comp_snap = repo.lookup_branch("main")
    raw = open(tmp_path / "repo" / "snapshots" / f"{comp_snap}.json", "rb").read()
    assert raw[:4] == b"ICZ1"

    # both eras read back transparently
    assert repo.lookup_snapshot(plain_snap).message == "uncompressed era"
    assert repo.lookup_snapshot(comp_snap).message == "compressed era"
    rows = repo.readonly_session().read_array_df("/a").collect()
    assert sorted(r["value"] for r in rows) == [float(i) for i in range(8)]


def test_repo_update_retries_bounds_cas_loop(spark, repo, monkeypatch):
    repo.save_config(RepositoryConfig(repo_update_retries=2))
    _write_array(repo, spark)
    s = repo.writable_session("main")
    s.set_chunk_bytes("/a", "0", b"y" * 16)

    calls = {"n": 0}

    def always_lose(root, name, snapshot_id, expected_gen):
        calls["n"] += 1
        raise RefError("branch moved (simulated contention)")

    monkeypatch.setattr(fmt, "update_branch", always_lose)
    with pytest.raises(RefError, match="2 times"):
        s.commit("contended")
    assert calls["n"] == 2


def test_caching_persists_resolved_manifest(spark, repo):
    repo.save_config(RepositoryConfig(caching=CachingConfig(num_chunk_refs=10_000)))
    _write_array(repo, spark)
    sess = repo.readonly_session()
    first = sess.read_array_df("/a").collect()
    assert hasattr(sess, "_manifest_cache") and len(sess._manifest_cache) == 1
    cached = next(iter(sess._manifest_cache.values()))
    assert cached.storageLevel.useMemory
    second = sess.read_array_df("/a").collect()
    assert sorted(r["value"] for r in first) == sorted(r["value"] for r in second)


def test_manifest_preload_paths_warm_sessions(spark, repo):
    repo.save_config(
        RepositoryConfig(
            caching=CachingConfig(num_chunk_refs=10_000),
            manifest=ManifestConfig(preload_paths=["/a", "/does-not-exist"]),
        )
    )
    _write_array(repo, spark)
    sess = repo.readonly_session()  # preload runs here, missing path ignored
    assert hasattr(sess, "_manifest_cache") and len(sess._manifest_cache) == 1


def test_get_partial_values_concurrency(spark, repo):
    repo.save_config(RepositoryConfig(get_partial_values_concurrency=8))
    _write_array(repo, spark)
    from icechunk_spark.repo.store import ChunkStore

    store = ChunkStore(repo.readonly_session())
    keys = [("a/c/0", (0, 8)), ("a/c/1", (8, 8)), ("a/zarr.json", (None, None))]
    out = store.get_partial_values(keys)
    assert len(out) == 3 and all(v is not None for v in out)
    assert len(out[0]) == 8 and len(out[1]) == 8
