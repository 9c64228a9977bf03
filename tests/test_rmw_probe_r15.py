"""Focused pins for the r15 fused RMW probe (_merge_partial_chunks):
one job now decides the merge AND enumerates payload files from the
pre-dedup manifest rows of the partial chunks.  The subtle case is a
FILELESS existing ref (a committed virtual ref, or an inline payload:
their manifest rows have file IS NULL), which the probe must still
count as "an existing ref touches a partial chunk" — skipping the
merge there would clobber the untouched cells with fill.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pytest

from icechunk_spark.engine import local_df
from icechunk_spark.repo import Repository


@pytest.fixture()
def root():
    d = os.path.join(tempfile.gettempdir(), f"icrmw_{uuid.uuid4().hex}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, coords_vals):
    return local_df(
        spark,
        [{"i0": int(i), "value": float(v)} for i, v in coords_vals],
        "i0 bigint, value double",
    )


def test_partial_write_over_committed_virtual_ref_still_merges(
    spark, root, tmp_path
):
    """Existing cells live behind a VIRTUAL ref (manifest row with
    file IS NULL); a later partial write into that chunk must
    read-modify-write through the virtual read path, not clobber."""
    ext = tmp_path / "external.bin"
    with open(ext, "wb") as f:
        f.write(b"HDR!")
        f.write(np.array([10.0, 11.0, 12.0, 13.0]).tobytes())
    repo = Repository.create(spark, root)
    prefix = str(tmp_path) + "/"
    repo.set_virtual_chunk_container("data", prefix)
    repo = Repository.open(
        spark, root, authorize_virtual_chunk_access={prefix: None}
    )
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[4], chunk_shape=[4])
        s.set_virtual_ref("/a", "0", str(ext), offset=4, length=32)
    with repo.transaction(message="v2") as s:
        s.write_array_df("/a", _rows(spark, [(0, 99.0), (2, 98.0)]))
    got = {
        int(r["i0"]): r["value"]
        for r in repo.readonly_session().read_array_df("/a").collect()
    }
    assert got[0] == 99.0 and got[2] == 98.0  # incoming rows win
    assert got[1] == 11.0 and got[3] == 13.0  # untouched cells kept


def test_partial_write_over_committed_chunk_still_merges(spark, root):
    """Plain committed-file case (regression pin for the fused probe)."""
    repo = Repository.create(spark, root)
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.write_array_df("/a", _rows(spark, [(i, float(i)) for i in range(8)]))
    with repo.transaction(message="v2") as s:
        s.write_array_df("/a", _rows(spark, [(1, 101.0), (6, 106.0)]))
    got = {
        int(r["i0"]): r["value"]
        for r in repo.readonly_session().read_array_df("/a").collect()
    }
    assert got[1] == 101.0 and got[6] == 106.0
    for i in (0, 2, 3, 4, 5, 7):
        assert got[i] == float(i)


def test_fully_covering_write_skips_merge_without_probe_regression(spark, root):
    """A second write covering every cell of its chunks must not pull
    existing cells in (values fully replaced)."""
    repo = Repository.create(spark, root)
    with repo.transaction(message="v1") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.write_array_df("/a", _rows(spark, [(i, 1.0) for i in range(8)]))
    with repo.transaction(message="v2") as s:
        s.write_array_df("/a", _rows(spark, [(i, 2.0) for i in range(4)]))
    got = {
        int(r["i0"]): r["value"]
        for r in repo.readonly_session().read_array_df("/a").collect()
    }
    assert all(got[i] == 2.0 for i in range(4))
    assert all(got[i] == 1.0 for i in range(4, 8))
