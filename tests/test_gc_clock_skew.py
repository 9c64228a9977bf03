"""GC clock-skew guard (reference PR #2310): a store clock running
behind the host must not make freshly written objects look old enough
to delete.  The guard measures the skew with a probe object and shifts
the age cutoff into the storage-clock frame."""

from __future__ import annotations

import os

import pytest

from icechunk_spark.repo import LocalFilesystemStorage, Repository
from icechunk_spark.repo import format as fmt
from icechunk_spark.repo import fsio
from icechunk_spark.repo.storage import _DelegatingStorage

SKEW = -7200.0  # the store's clock runs 2 hours BEHIND the host


class _SkewedStorage(_DelegatingStorage):
    """Every storage timestamp arrives 2h in the past, exactly like an
    object store whose LastModified clock lags the GC host."""

    def mtime(self, key: str) -> float:
        return self.inner.mtime(key) + SKEW


@pytest.fixture()
def skewed_repo(spark, tmp_path, monkeypatch):
    st = _SkewedStorage(LocalFilesystemStorage(str(tmp_path / "skewrepo")))
    repo = Repository.create(spark, st)
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[4], chunk_shape=[2])
        s.set_chunk_bytes("/a", "0", b"D" * 1024)
    # the data plane (txlogs/chunks/staging read via fsio) lives on the
    # same skewed store
    real_mtime = fsio.mtime
    monkeypatch.setattr(
        fsio, "mtime", lambda p: None if (t := real_mtime(p)) is None else t + SKEW
    )
    return repo, st


def test_probe_measures_storage_skew(skewed_repo):
    repo, _ = skewed_repo
    measured = repo._storage_clock_skew()
    assert abs(measured - SKEW) < 5.0


def test_inflight_txlog_and_staging_survive_skewed_gc(skewed_repo):
    repo, st = skewed_repo
    # an in-flight concurrent committer: txlog written, snapshot json
    # not yet visible — an "orphan" to this GC run, seconds old on the
    # host but stamped 2h in the past by the skewed store
    tx = fmt.data_path(st, os.path.join("txlogs", "zinflight0000.parquet"))
    os.makedirs(tx, exist_ok=True)  # Spark txlogs are parquet DIRECTORIES
    with open(os.path.join(tx, "part-00000.parquet"), "wb") as f:
        f.write(b"not-yet-referenced")
    stage = fmt.data_path(st, os.path.join("staging", "live-session"))
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "m00000.parquet"), "wb") as f:
        f.write(b"buffered")

    summary = repo.garbage_collect(older_than_seconds=3600)
    assert summary.txlogs_deleted == 0
    assert os.path.exists(tx), "skew guard must keep the in-flight txlog"
    assert os.path.exists(stage), "skew guard must keep the live staging dir"

    # sharpness: with the guard disabled the same GC DOES reap them —
    # the exact pre-#2310 data-loss scenario
    repo._storage_clock_skew = lambda: 0.0
    summary = repo.garbage_collect(older_than_seconds=3600)
    assert summary.txlogs_deleted == 1
    assert not os.path.exists(tx)
    assert not os.path.exists(stage)
