"""Repository.reopen, storage observability wrappers, spec-version
migrations, and the CLI (reference parity: Repository.reopen,
storage/latency.rs + logging.rs, migrations/mod.rs, cli/interface.rs).
"""

from __future__ import annotations

import json

import pytest

from icechunk_spark.repo import (
    LatencyStorage,
    LoggingStorage,
    RefError,
    Repository,
    RepositoryConfig,
    migrate_repository,
    resolve_storage,
    spec_version_of,
)
from icechunk_spark.repo import format as fmt


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "repo"))


def test_reopen_overrides_config_without_persisting(spark, repo):
    override = RepositoryConfig(inline_chunk_threshold_bytes=0)
    r2 = repo.reopen(config=override)
    assert r2.config().inline_chunk_threshold_bytes == 0
    # not persisted: the original handle still sees the stored default
    assert repo.config().inline_chunk_threshold_bytes != 0 or fmt.read_config_doc(
        repo.root
    ) is None
    # the override reaches sessions: a tiny chunk that would inline by
    # default is stored as a native chunk under threshold 0
    with r2.transaction(message="init") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"tiny")
    sess = r2.readonly_session()
    assert sess.get_chunk_bytes("/a", "0") == b"tiny"
    assert sess.chunk_type("/a", (0,)).name == "native"
    # same write through the non-overridden handle inlines (default 512)
    with repo.transaction(message="b") as s:
        s.create_array("/b", shape=[4], chunk_shape=[4])
        s.set_chunk_bytes("/b", "0", b"tiny")
    assert repo.readonly_session().chunk_type("/b", (0,)).name == "inline"


def test_reopen_swaps_virtual_authorization(spark, repo):
    r2 = repo.reopen(authorize_virtual_chunk_access={"file:///data/": None})
    assert r2._virtual_auth == {"file:///data/": None}
    assert repo._virtual_auth == {}


def test_latency_and_logging_storage(repo):
    inner = resolve_storage(str(repo.root))
    lat = LatencyStorage(inner)
    lat.get_json("repo.json")
    lat.exists("repo.json")
    stats = lat.stats()
    assert stats["get"]["count"] == 1 and stats["exists"]["count"] == 1
    assert stats["get"]["total_s"] >= 0.0

    lines: list[str] = []
    log = LoggingStorage(inner, log_fn=lines.append)
    log.get_json("repo.json")
    assert len(lines) == 1 and lines[0].startswith("storage get repo.json")
    # wrappers are full Storage implementations: ref reads work through them
    assert fmt.branch_tip(lat, "main")


def test_migrations_upgrade_v0_layout(spark, tmp_path):
    root = str(tmp_path / "repo")
    Repository.create(spark, root)
    # regress the layout to v0 (pre-spec: no format_version key)
    info = fmt.read_repo_info(root)
    del info["format_version"]
    fmt.write_repo_info(root, info)
    assert spec_version_of(root) == 0
    with pytest.raises(RefError, match="migrate"):
        Repository.open(spark, root)
    assert migrate_repository(root, dry_run=True) == [0, 1]
    assert spec_version_of(root) == 0  # dry run touches nothing
    assert migrate_repository(root) == [0, 1]
    assert spec_version_of(root) == 2
    assert migrate_repository(root) == []  # idempotent
    Repository.open(spark, root)  # gate passes now

    # a v1 layout (flat chunks/) OPENS fine (sessions honor the pinned
    # layout) and migrates with the single v1->v2 step when asked
    info = fmt.read_repo_info(root)
    info["format_version"] = 1
    fmt.write_repo_info(root, info)
    Repository.open(spark, root)  # v1 is a supported read/write layout
    assert migrate_repository(root) == [1]
    assert spec_version_of(root) == 2

    # a FUTURE layout is refused, not migrated
    info = fmt.read_repo_info(root)
    info["format_version"] = 99
    fmt.write_repo_info(root, info)
    with pytest.raises(RefError, match="newer"):
        Repository.open(spark, root)
    with pytest.raises(RefError, match="newer"):
        migrate_repository(root)


def test_cli_metadata_commands(spark, tmp_path, capsys):
    from icechunk_spark.cli import main

    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)
    with repo.transaction(message="first data") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
    repo.create_tag("v1", repo.lookup_branch("main"))

    assert main(["branches", root]) == 0
    assert json.loads(capsys.readouterr().out)["main"] == repo.lookup_branch("main")

    assert main(["tags", root]) == 0
    assert json.loads(capsys.readouterr().out)["v1"] == repo.lookup_branch("main")

    assert main(["ancestry", root, "-n", "1"]) == 0
    hist = json.loads(capsys.readouterr().out)
    assert hist[0]["message"] == "first data"

    assert main(["status", root]) == 0
    assert json.loads(capsys.readouterr().out)["availability"] == "online"

    assert main(["set-status", root, "read_only", "--reason", "maint"]) == 0
    assert json.loads(capsys.readouterr().out)["availability"] == "read_only"
    assert main(["set-status", root, "online"]) == 0
    capsys.readouterr()

    assert main(["info", root]) == 0
    info = json.loads(capsys.readouterr().out)
    assert "main" in info["branches"] and info["spec_version"] == 2

    assert main(["migrate", root]) == 0
    assert json.loads(capsys.readouterr().out)["applied_from_versions"] == []

    assert main(["expire", root, "--older-than", "999999"]) == 0
    assert json.loads(capsys.readouterr().out)["expired_snapshots"] == []

    # errors exit 1 with a message, not a traceback
    assert main(["info", str(tmp_path / "nope")]) == 1
    assert "error:" in capsys.readouterr().err


def test_cli_gc_and_compact(spark, tmp_path, capsys):
    from icechunk_spark.cli import main

    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)
    for i in range(2):
        with repo.transaction(message=f"c{i}") as s:
            if i == 0:
                s.create_array("/a", shape=[8], chunk_shape=[4])
            s.set_chunk_bytes("/a", "0", bytes([i]) * 4096)

    assert main(["compact", root]) == 0
    json.loads(capsys.readouterr().out)
    tip = repo.lookup_snapshot(repo.lookup_branch("main"))
    assert len(tip.manifests) == 1

    assert main(["gc", root, "--older-than", "-1", "--dry-run"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dry_run"] is True and out["chunk_files_deleted"] >= 0


def test_create_with_pinned_spec_version(spark, tmp_path):
    """Repository.create(spec_version=1) writes the v1 FLAT chunk
    layout (readable by v1 engines); after migrating to v2, NEW writes
    land sharded while the old flat chunks stay readable — mixed
    layout, zero manifest rewrites."""
    from icechunk_spark.repo import fsio

    root = str(tmp_path / "pinned")
    repo = Repository.create(spark, root, spec_version=1)
    assert spec_version_of(root) == 1
    with repo.transaction(message="v1 write") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"x" * 4096)
    top = fsio.list_child_names(fmt.data_path(root, "chunks"))
    assert top and all(n.endswith(".parquet") for n in top), top  # flat

    assert migrate_repository(root) == [1]
    repo2 = Repository.open(spark, root)
    with repo2.transaction(message="v2 write") as s:
        s.set_chunk_bytes("/a", "1", b"y" * 4096)
    top = sorted(fsio.list_child_names(fmt.data_path(root, "chunks")))
    assert any(len(n) == 2 for n in top), top  # sharded write landed
    assert any(n.endswith(".parquet") for n in top), top  # flat survives
    sess = repo2.readonly_session()
    assert sess.get_chunk_bytes("/a", "0") == b"x" * 4096
    assert sess.get_chunk_bytes("/a", "1") == b"y" * 4096

    # out-of-range pins are refused
    with pytest.raises(ValueError, match="spec_version"):
        Repository.create(spark, str(tmp_path / "bad"), spec_version=99)


def test_cli_vrefs(spark, tmp_path, capsys):
    import numpy as np

    from icechunk_spark.cli import main

    ext = tmp_path / "ext.bin"
    with open(ext, "wb") as f:
        f.write(np.arange(8, dtype="float64").tobytes())
    prefix = str(tmp_path) + "/"
    root = str(tmp_path / "vrepo")
    repo = Repository.create(
        spark, root, authorize_virtual_chunk_access={prefix: None}
    )
    repo.set_virtual_chunk_container("data", prefix)
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[8], chunk_shape=[4])
        s.set_virtual_ref("/v", "0", str(ext), offset=0, length=32)
        s.set_virtual_ref("/v", "1", "vcc://data/ext.bin", offset=32, length=32)

    assert main(["vrefs", root]) == 0
    rows = json.loads(capsys.readouterr().out)
    by_loc = {r["location"]: r for r in rows}
    assert by_loc[str(ext)]["ref_count"] == 1
    assert by_loc["vcc://data/ext.bin"]["resolved_location"] == prefix + "ext.bin"


def test_store_set_virtual_refs_specs(spark, tmp_path):
    """store.set_virtual_refs accepts VirtualChunkSpec objects
    (reference store.py:363) including their checksum fields."""
    import datetime as dt
    import os

    import numpy as np

    from icechunk_spark.errors import IcechunkError
    from icechunk_spark.repo.store import ChunkStore
    from icechunk_spark.types import VirtualChunkSpec

    ext = tmp_path / "specs.bin"
    with open(ext, "wb") as f:
        f.write(np.arange(8, dtype="float64").tobytes())
    prefix = str(tmp_path) + "/"
    mtime = os.path.getmtime(ext)
    stale = dt.datetime.fromtimestamp(mtime - 5, dt.timezone.utc)
    root = str(tmp_path / "srepo")
    repo = Repository.create(
        spark, root, authorize_virtual_chunk_access={prefix: None}
    )
    repo.set_virtual_chunk_container("data", prefix)
    with repo.transaction(message="virt") as s:
        s.create_array("/v", shape=[8], chunk_shape=[4])
        store = ChunkStore(s)
        store.set_virtual_refs(
            "/v",
            [
                VirtualChunkSpec(index=[0], location=str(ext), offset=0, length=32),
                VirtualChunkSpec(
                    index=[1],
                    location=str(ext),
                    offset=32,
                    length=32,
                    last_updated_at_checksum=stale,
                ),
            ],
        )
    ro = repo.readonly_session()
    assert ro.get_chunk_bytes("/v", "0") == np.arange(4, dtype="float64").tobytes()
    with pytest.raises(IcechunkError, match="modified after"):
        ro.get_chunk_bytes("/v", "1")
