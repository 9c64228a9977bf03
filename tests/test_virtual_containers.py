"""Virtual chunk containers + authorization (reference parity:
icechunk/src/virtual_chunks.rs VirtualChunkContainer;
Repository.authorized_virtual_container_prefixes in
icechunk-python/python/icechunk/repository.py)."""

from __future__ import annotations

import numpy as np
import pytest

from icechunk_spark.repo import RefError, Repository


@pytest.fixture()
def ext_file(tmp_path):
    p = tmp_path / "external.bin"
    with open(p, "wb") as f:
        f.write(b"HDR!")
        f.write(np.arange(4, dtype="float64").tobytes())
    return str(p)


def _mkrepo(spark, tmp_path, prefix):
    repo = Repository.create(spark, str(tmp_path / "repo"))
    repo.set_virtual_chunk_container("data", prefix)
    return repo


def test_container_config_roundtrip(spark, tmp_path):
    repo = _mkrepo(spark, tmp_path, "file:///data/")
    repo.set_virtual_chunk_container("lake", "s3://bucket/prefix/")
    assert repo.virtual_chunk_containers() == {
        "data": "file:///data/",
        "lake": "s3://bucket/prefix/",
    }
    # persisted: a fresh open sees the same containers
    reopened = Repository.open(spark, repo.root)
    assert reopened.virtual_chunk_containers() == repo.virtual_chunk_containers()
    reopened.delete_virtual_chunk_container("lake")
    assert "lake" not in reopened.virtual_chunk_containers()


def test_url_prefix_must_end_with_slash(spark, tmp_path):
    repo = Repository.create(spark, str(tmp_path / "repo"))
    with pytest.raises(ValueError, match="must end in a /"):
        repo.set_virtual_chunk_container("bad", "s3://bucket/prefix")


def test_write_outside_container_denied(spark, tmp_path, ext_file):
    repo = _mkrepo(spark, tmp_path, "s3://somewhere-else/")
    with pytest.raises(RefError, match="no configured virtual chunk container"):
        with repo.transaction(message="virt") as s:
            s.create_array("/v", shape=[4], chunk_shape=[4])
            s.set_virtual_ref("/v", "0", ext_file, offset=4, length=32)


def test_read_requires_authorization(spark, tmp_path, ext_file):
    prefix = ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[4], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", ext_file, offset=4, length=32)

    # opened WITHOUT authorization: both read paths refuse
    unauth = Repository.open(spark, repo.root)
    assert unauth.authorized_virtual_container_prefixes == set()
    with pytest.raises(RefError, match="not under an authorized"):
        unauth.readonly_session().get_chunk_bytes("/v", "0")
    with pytest.raises(RefError, match="not under an authorized"):
        unauth.readonly_session().read_array_df("/v").collect()

    # opened WITH authorization for the container: reads succeed
    auth = Repository.open(spark, repo.root, authorize_virtual_chunk_access={prefix: None})
    assert auth.authorized_virtual_container_prefixes == {prefix}
    got = auth.readonly_session().get_chunk_bytes("/v", "0")
    assert got == np.arange(4, dtype="float64").tobytes()
    rows = auth.readonly_session().read_array_df("/v").collect()
    assert sorted(r["value"] for r in rows) == [0.0, 1.0, 2.0, 3.0]


def test_authorization_ignores_unconfigured_prefixes(spark, tmp_path, ext_file):
    prefix = ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    # authorizing a prefix that is not a configured container grants nothing
    other = Repository.open(
        spark, repo.root, authorize_virtual_chunk_access={"s3://elsewhere/": None}
    )
    assert other.authorized_virtual_container_prefixes == set()


# --- vcc:// relative refs (design-docs/014-virtual-chunk-ref-efficiency.md)


def test_vcc_relative_ref_roundtrip(spark, tmp_path, ext_file):
    """A `vcc://<name>/<relative>` ref stores the compact relative form
    in the manifest and resolves through the named container's
    url_prefix on BOTH read paths (point read + distributed decode)."""
    prefix = "file://" + ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    rel = "vcc://data/" + ext_file[ext_file.rindex("/") + 1 :]
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[4], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", rel, offset=4, length=32)

    auth = Repository.open(spark, repo.root, authorize_virtual_chunk_access={prefix: None})
    sess = auth.readonly_session()
    # the manifest keeps the relative form (relocatable, compact)
    assert sess.all_virtual_chunk_locations() == [rel]
    assert sess.get_chunk_bytes("/v", "0") == np.arange(4, dtype="float64").tobytes()
    rows = sess.read_array_df("/v").collect()
    assert sorted(r["value"] for r in rows) == [0.0, 1.0, 2.0, 3.0]


def test_vcc_unknown_name_rejected_at_write(spark, tmp_path):
    repo = _mkrepo(spark, tmp_path, "file:///data/")
    with pytest.raises(RefError, match="unknown"):
        with repo.transaction(message="virt") as s:
            s.create_array("/v", shape=[4], chunk_shape=[4])
            s.set_virtual_ref("/v", "0", "vcc://nope/x.bin", offset=0, length=8)


def test_vcc_relocation_repoints_without_manifest_rewrite(spark, tmp_path, ext_file):
    """The point of relative refs: moving the external data means
    updating ONE url_prefix — committed manifests stay valid."""
    import shutil

    prefix = "file://" + ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    name = ext_file[ext_file.rindex("/") + 1 :]
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[4], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", f"vcc://data/{name}", offset=4, length=32)

    # relocate the external file and re-point the container
    newdir = tmp_path / "moved"
    newdir.mkdir()
    shutil.copy(ext_file, newdir / name)
    newprefix = f"file://{newdir}/"
    repo.set_virtual_chunk_container("data", newprefix)

    auth = Repository.open(spark, repo.root, authorize_virtual_chunk_access={newprefix: None})
    got = auth.readonly_session().get_chunk_bytes("/v", "0")
    assert got == np.arange(4, dtype="float64").tobytes()


def test_vcc_read_requires_named_containers_authorization(spark, tmp_path, ext_file):
    prefix = "file://" + ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    rel = "vcc://data/" + ext_file[ext_file.rindex("/") + 1 :]
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[4], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", rel, offset=4, length=32)
    unauth = Repository.open(spark, repo.root)
    with pytest.raises(RefError, match="not under an authorized"):
        unauth.readonly_session().get_chunk_bytes("/v", "0")
    with pytest.raises(RefError, match="not under an authorized"):
        unauth.readonly_session().read_array_df("/v").collect()


def test_virtual_chunk_locations_df(spark, tmp_path, ext_file):
    """The DataFrame audit surface: per-location ref counts/bytes with
    vcc:// resolution as a column expression (no driver collection);
    agrees with the list-returning parity API."""
    prefix = ext_file[: ext_file.rindex("/") + 1]
    repo = _mkrepo(spark, tmp_path, prefix)
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[12], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", ext_file, offset=4, length=32)
        s.set_virtual_ref("/v", "1", f"vcc://data/external.bin", offset=4, length=16)
        s.set_virtual_ref("/v", "2", f"vcc://data/external.bin", offset=20, length=16)

    sess = Repository.open(
        spark, repo.root, authorize_virtual_chunk_access={prefix: None}
    ).readonly_session()
    rows = {r["location"]: r for r in sess.virtual_chunk_locations_df().collect()}
    assert set(rows) == {ext_file, "vcc://data/external.bin"}
    vcc = rows["vcc://data/external.bin"]
    assert vcc["resolved_location"] == prefix + "external.bin"
    assert vcc["ref_count"] == 2 and vcc["total_bytes"] == 32
    abs_row = rows[ext_file]
    assert abs_row["resolved_location"] == ext_file
    assert abs_row["ref_count"] == 1 and abs_row["total_bytes"] == 32
    # agrees with the parity list API
    assert sess.all_virtual_chunk_locations() == sorted(rows)


def test_virtual_ref_checksum_validation(spark, tmp_path, ext_file):
    """Reference parity (store.py:253): set_virtual_ref(checksum=...)
    persists an etag/last-modified checksum with the ref and read paths
    verify it — a virtual ref whose external object changed fails
    instead of silently returning different bytes."""
    import datetime as dt
    import os

    from icechunk_spark.errors import IcechunkError

    prefix = ext_file[: ext_file.rindex("/") + 1]
    repo = Repository.create(
        spark,
        str(tmp_path / "repo"),
        authorize_virtual_chunk_access={prefix: None},
    )
    repo.set_virtual_chunk_container("data", prefix)
    mtime = os.path.getmtime(ext_file)
    fresh = dt.datetime.fromtimestamp(mtime + 5, dt.timezone.utc)
    stale = dt.datetime.fromtimestamp(mtime - 5, dt.timezone.utc)
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[12], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", ext_file, offset=4, length=32, checksum=fresh)
        s.set_virtual_ref("/v", "1", ext_file, offset=4, length=32, checksum=stale)
        s.set_virtual_ref("/v", "2", ext_file, offset=4, length=32, checksum="some-etag")
        # buffered read-your-writes path validates too
        assert s.get_chunk_bytes("/v", "0") is not None
        with pytest.raises(IcechunkError, match="modified after"):
            s.get_chunk_bytes("/v", "1")

    auth = type(repo).open(
        spark, repo.root, authorize_virtual_chunk_access={prefix: None}
    )
    ro = auth.readonly_session()
    # fresh checksum: passes; persisted across commit
    assert ro.get_chunk_bytes("/v", "0") is not None
    # stale checksum: the object's mtime is NEWER than recorded -> fail
    with pytest.raises(IcechunkError, match="modified after"):
        ro.get_chunk_bytes("/v", "1")
    # etag checksums round-trip (no etag on local fs -> not verifiable)
    assert ro.get_chunk_bytes("/v", "2") is not None
    rows = {
        r["location"]: r for r in ro.virtual_chunk_locations_df().collect()
    }
    assert rows[ext_file]["ref_count"] == 3
    # the distributed decode path (read_array_df -> mapInPandas) also
    # verifies: chunk 1's stale ref poisons the full-array read
    with pytest.raises(Exception, match="modified after"):
        ro.read_array_df("/v").collect()
    # a slice touching only the fresh chunk reads clean
    vals = ro.read_array_df("/v", slices=[(0, 4)]).collect()
    assert len(vals) == 4


def test_none_credential_deprecation_warning(spark, tmp_path):
    """`None` in authorize_virtual_chunk_access warns (icechunk#2194,
    reference repository.py:55-84); the explicit sentinels do not."""
    import warnings

    from icechunk_spark import HttpAccess, LocalFileSystemAccess

    repo = Repository.create(spark, str(tmp_path / "repo"))
    with pytest.warns(DeprecationWarning, match=r"file://ext/.*LocalFileSystemAccess"):
        Repository.open(spark, repo.root, authorize_virtual_chunk_access={"file://ext/": None})
    with pytest.warns(DeprecationWarning, match=r"s3://bkt/.*FromEnv.*expose private"):
        Repository.open(spark, repo.root, authorize_virtual_chunk_access={"s3://bkt/": None})
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # sentinels must stay silent
        Repository.open(
            spark,
            repo.root,
            authorize_virtual_chunk_access={
                "file://ext/": LocalFileSystemAccess,
                "https://host/": HttpAccess,
            },
        )
