"""Zarr v3 spec-conformance fixtures for the store facade.

zarr-python is not installed in this container, so conformance is
pinned with vendored golden expectations instead of a live client:
byte-exact ``zarr.json`` documents in the reference's canonical serde
field order (icechunk/src/store.rs metadata roundtrip tests,
store.rs:1489-1772) and chunk-key-layout assertions (``c/0/0``-style
keys, ``default`` encoding with ``/`` separator).  Any drift a real
zarr client would trip over — wrong field nesting, missing node_type,
spaced JSON, dropped codecs — fails here.
"""

from __future__ import annotations

import json

import pytest

from icechunk_spark.repo.format import RefError
from icechunk_spark.repo.repository import Repository
from icechunk_spark.repo.store import ChunkStore


@pytest.fixture()
def repo(spark, tmp_path):
    return Repository.create(spark, str(tmp_path / "zc"))


def _w(repo):
    return repo.writable_session("main")


# ---------------------------------------------------------------------------
# golden documents (byte-exact)
# ---------------------------------------------------------------------------


def test_group_doc_golden_bytes(repo):
    """Root group with no attributes serializes to the exact document
    the reference serves (store.rs:1733)."""
    store = ChunkStore(repo.readonly_session())
    assert store.get("zarr.json") == b'{"zarr_format":3,"node_type":"group"}'


def test_group_doc_with_attributes_golden_bytes(repo):
    s = _w(repo)
    s.create_group("/a/b", attrs={"spam": "ham", "eggs": 42})
    doc = ChunkStore(s).get("a/b/zarr.json")
    assert doc == b'{"zarr_format":3,"node_type":"group","attributes":{"spam":"ham","eggs":42}}'


def test_array_doc_golden_bytes(repo):
    """Array document: canonical field order, regular chunk_grid,
    default chunk_key_encoding with "/" separator, little-endian bytes
    codec, dimension_names last (store.rs:1495 field order)."""
    s = _w(repo)
    s.create_array(
        "/t",
        shape=[4, 6],
        chunk_shape=[2, 3],
        dtype="float64",
        fill_value=0.0,
        dimension_names=["x", "y"],
    )
    expected = (
        b'{"zarr_format":3,"node_type":"array",'
        b'"shape":[4,6],"data_type":"float64",'
        b'"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[2,3]}},'
        b'"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},'
        b'"fill_value":0.0,'
        b'"codecs":[{"name":"bytes","configuration":{"endian":"little"}}],'
        b'"dimension_names":["x","y"]}'
    )
    assert ChunkStore(s).get("t/zarr.json") == expected


def test_array_doc_attributes_follow_node_type(repo):
    """When attributes are present they appear directly after
    node_type, matching the reference's serde order (store.rs:1495)."""
    s = _w(repo)
    s.create_array("/u", shape=[2], chunk_shape=[1], dtype="int32", attrs={"foo": 42})
    raw = ChunkStore(s).get("u/zarr.json").decode()
    assert raw.startswith('{"zarr_format":3,"node_type":"array","attributes":{"foo":42},"shape":[2]')


# ---------------------------------------------------------------------------
# client-document roundtrip (what zarr-python writes must read back)
# ---------------------------------------------------------------------------

CLIENT_ARRAY_DOC = (
    '{"zarr_format":3,"node_type":"array","attributes":{"foo":42},'
    '"shape":[2,2,2],"data_type":"int32",'
    '"chunk_grid":{"name":"regular","configuration":{"chunk_shape":[1,1,1]}},'
    '"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},'
    '"fill_value":0,'
    '"codecs":[{"name":"mycodec","configuration":{"foo":42}}],'
    '"storage_transformers":[{"name":"mytransformer","configuration":{"bar":43}}],'
    '"dimension_names":["x","y","t"]}'
)


def test_client_array_doc_roundtrips_byte_for_byte(repo):
    """The reference's own set/get roundtrip fixture
    (icechunk/src/store.rs:1495): custom codecs, storage_transformers
    and dimension_names must read back exactly as written."""
    s = _w(repo)
    store = ChunkStore(s)
    store.set("array/zarr.json", CLIENT_ARRAY_DOC.encode())
    assert store.get("array/zarr.json") == CLIENT_ARRAY_DOC.encode()


def test_client_doc_survives_commit(repo):
    s = _w(repo)
    ChunkStore(s).set("array/zarr.json", CLIENT_ARRAY_DOC.encode())
    s.commit("add array")
    ro = ChunkStore(repo.readonly_session())
    assert ro.get("array/zarr.json") == CLIENT_ARRAY_DOC.encode()


def test_group_doc_roundtrips(repo):
    raw = b'{"zarr_format":3,"node_type":"group","attributes":{"spam":"ham","eggs":42}}'
    s = _w(repo)
    store = ChunkStore(s)
    store.set("g/zarr.json", raw)
    assert store.get("g/zarr.json") == raw


def test_invalid_node_type_rejected(repo):
    """store.rs:1684 rejects node_type values other than array/group."""
    store = ChunkStore(_w(repo))
    with pytest.raises(RefError):
        store.set("bad/zarr.json", b'{"zarr_format":3,"node_type":"zarr"}')


# ---------------------------------------------------------------------------
# chunk-key layout
# ---------------------------------------------------------------------------


def test_chunk_key_layout(repo):
    """Chunk payload keys are <path>/c/<i>/<j> under the default
    encoding; a root-level array uses bare c/<i> keys."""
    s = _w(repo)
    s.create_array("/grid", shape=[4, 4], chunk_shape=[2, 2], dtype="float64")
    store = ChunkStore(s)
    store.set("grid/c/0/0", b"\x00" * 32)
    store.set("grid/c/1/1", b"\x01" * 32)
    keys = sorted(store.list_prefix("grid/c/"))
    assert keys == ["grid/c/0/0", "grid/c/1/1"]
    assert store.get("grid/c/1/1") == b"\x01" * 32
    # list_dir at the array level exposes metadata doc + chunk dir head
    assert sorted(store.list_dir("grid")) == ["c", "zarr.json"]


def test_root_array_chunk_keys(repo):
    s = _w(repo)
    s.create_array("/v", shape=[3], chunk_shape=[1], dtype="int64")
    store = ChunkStore(s)
    store.set("v/c/2", b"\x02" * 8)
    assert list(store.list_prefix("v/c/")) == ["v/c/2"]


def test_docs_parse_as_spec_zarr_v3(repo):
    """Every served document parses and carries the mandatory v3
    members per the zarr v3 core spec (zarr-specs v3.0 §Metadata)."""
    s = _w(repo)
    s.create_array("/m", shape=[2, 2], chunk_shape=[1, 1], dtype="float32")
    store = ChunkStore(s)
    for key in ["zarr.json", "m/zarr.json"]:
        doc = json.loads(store.get(key))
        assert doc["zarr_format"] == 3
        assert doc["node_type"] in ("array", "group")
        if doc["node_type"] == "array":
            for member in (
                "shape",
                "data_type",
                "chunk_grid",
                "chunk_key_encoding",
                "fill_value",
                "codecs",
            ):
                assert member in doc, member
            assert doc["chunk_grid"]["name"] == "regular"
            assert isinstance(doc["chunk_grid"]["configuration"]["chunk_shape"], list)


# ---------------------------------------------------------------------------
# rectilinear chunk grids (store.rs:1206, design-docs/018)
# ---------------------------------------------------------------------------

RECTI_DOC = (
    '{"zarr_format":3,"node_type":"array","shape":[3],"data_type":"int32",'
    '"chunk_grid":{"name":"rectilinear","configuration":{"chunk_shapes":[[1,2]]}},'
    '"chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},'
    '"fill_value":0,"codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}'
)


def test_rectilinear_doc_roundtrips(repo):
    """The reference's rectilinear fixture (session.rs:6026) must
    round-trip byte-for-byte; key-addressed chunk IO works."""
    s = _w(repo)
    store = ChunkStore(s)
    store.set("r/zarr.json", RECTI_DOC.encode())
    assert store.get("r/zarr.json") == RECTI_DOC.encode()
    store.set("r/c/0", b"\x01\x00\x00\x00")
    assert store.get("r/c/0") == b"\x01\x00\x00\x00"


def test_rectilinear_grid_shape_rle(repo):
    """grid_shape counts chunks for both listed and run-length-encoded
    chunk_shapes (store.rs num_chunks parity)."""
    s = _w(repo)
    store = ChunkStore(s)
    doc = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [6, 5],
        "data_type": "float64",
        "chunk_grid": {
            "name": "rectilinear",
            # dim0: sizes [2, [2,2]] -> 3 chunks; dim1: [1,1,3] -> 3
            "configuration": {"chunk_shapes": [[2, [2, 2]], [1, 1, 3]]},
        },
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
    }
    store.set("g/zarr.json", json.dumps(doc, separators=(",", ":")).encode())
    assert s.array_meta("/g").grid_shape() == [3, 3]


def test_rectilinear_rejects_regular_grid_ops(repo):
    """Regular-grid array ops are undefined on rectilinear arrays and
    must be refused (session.rs:6059 shift_array rejection)."""
    s = _w(repo)
    ChunkStore(s).set("r/zarr.json", RECTI_DOC.encode())
    with pytest.raises(RefError, match="rectilinear"):
        s.shift_array("/r", [1])
    with pytest.raises(RefError, match="rectilinear"):
        s.read_array_df("/r")
    with pytest.raises(RefError, match="rectilinear"):
        s.reindex_array("/r", lambda c: c)


def test_unsupported_chunk_grid_rejected(repo):
    store = ChunkStore(_w(repo))
    bad = RECTI_DOC.replace("rectilinear", "hilbert")
    with pytest.raises(RefError, match="Only 'regular' and 'rectilinear'"):
        store.set("x/zarr.json", bad.encode())


# ---------------------------------------------------------------------------
# metadata updates on existing nodes (resize/append — store.rs update path)
# ---------------------------------------------------------------------------


def test_resize_array_via_store_set(repo):
    """The zarr append workflow: re-write zarr.json with a larger
    shape, then write chunks beyond the old bounds.  The node id (and
    existing chunk refs) survive the resize."""
    s = _w(repo)
    store = ChunkStore(s)
    s.create_array("/t", shape=[4], chunk_shape=[4], dtype="float64")
    store.set("t/c/0", b"\x01" * 32)
    nid = s.array_meta("/t").node_id
    doc = json.loads(store.get("t/zarr.json"))
    doc["shape"] = [8]
    store.set("t/zarr.json", json.dumps(doc, separators=(",", ":")).encode())
    assert s.array_meta("/t").shape == [8]
    assert s.array_meta("/t").node_id == nid  # same node, refs intact
    store.set("t/c/1", b"\x02" * 32)  # append beyond the old bounds
    assert store.get("t/c/0") == b"\x01" * 32
    assert store.get("t/c/1") == b"\x02" * 32
    s.commit("resized")
    assert json.loads(ChunkStore(repo.readonly_session()).get("t/zarr.json"))["shape"] == [8]


def test_resize_immutable_dtype_and_grid(repo):
    s = _w(repo)
    store = ChunkStore(s)
    s.create_array("/t", shape=[4], chunk_shape=[4], dtype="float64")
    doc = json.loads(store.get("t/zarr.json"))
    bad = dict(doc, data_type="int32")
    with pytest.raises(RefError, match="dtype"):
        store.set("t/zarr.json", json.dumps(bad).encode())
    bad = json.loads(store.get("t/zarr.json"))
    bad["chunk_grid"]["configuration"]["chunk_shape"] = [2]
    with pytest.raises(RefError, match="chunk grid"):
        store.set("t/zarr.json", json.dumps(bad).encode())


def test_shrink_crops_reads(spark, repo):
    """Chunks beyond a SHRUNK shape stop being read (boundary crop) —
    the refs linger until GC but never surface."""
    from icechunk_spark.engine import local_df

    s = _w(repo)
    s.create_array("/t", shape=[8], chunk_shape=[4], dtype="float64")
    s.write_array_df(
        "/t", local_df(spark, [(i, float(i)) for i in range(8)], "i0 long, value double")
    )
    s.update_array("/t", shape=[4])
    got = sorted(r["i0"] for r in s.read_array_df("/t").collect())
    assert got == [0, 1, 2, 3]


def test_group_attrs_replace_via_set(repo):
    s = _w(repo)
    store = ChunkStore(s)
    s.create_group("/g", attrs={"a": 1, "b": 2})
    store.set("g/zarr.json", b'{"zarr_format":3,"node_type":"group","attributes":{"c":3}}')
    # whole-doc rewrite REPLACES attributes (not a merge)
    assert store.get("g/zarr.json") == b'{"zarr_format":3,"node_type":"group","attributes":{"c":3}}'


def test_concurrent_metadata_updates_conflict(spark, tmp_path):
    """ZarrMetadataDoubleUpdate (conflicts/detector.rs): two sessions
    resizing the same array must conflict at rebase."""
    from icechunk_spark.repo.session import ConflictError

    repo = Repository.create(spark, str(tmp_path / "zc2"))
    with repo.transaction(message="init") as s:
        s.create_array("/t", shape=[4], chunk_shape=[4])
    s1 = repo.writable_session("main")
    s2 = repo.writable_session("main")
    s1.update_array("/t", shape=[8])
    s2.update_array("/t", shape=[12])
    s1.commit("grow to 8")
    with pytest.raises(ConflictError):
        s2.commit("grow to 12")


# ---------------------------------------------------------------------------
# delete of impossible keys is a no-op (reference PR #2312,
# store.rs:515-549 + test_chunk_delete / test_metadata_delete matrix)
# ---------------------------------------------------------------------------


def test_delete_impossible_chunk_keys_is_noop(repo):
    s = _w(repo)
    store = ChunkStore(s)
    store.set(
        "zarr.json", b'{"zarr_format":3,"node_type":"group"}'
    )
    store.set(
        "array/zarr.json",
        json.dumps(
            {
                "zarr_format": 3,
                "node_type": "array",
                "shape": [2, 2, 2],
                "data_type": "int32",
                "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [1, 1, 1]}},
                "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
                "fill_value": 0,
                "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
            }
        ).encode(),
    )
    data = b"hello"
    store.set("array/c/0/1/0", data)
    store.delete("array/c/0/1/0")
    store.delete("array/c/0/1/0")  # deleting a deleted chunk is allowed
    store.delete("array/c/1/1/1")  # deleting a never-written chunk is allowed
    assert store.get("array/c/0/1/0") is None

    # malformed keys still raise (store.rs: InvalidKey)
    with pytest.raises(RefError):
        store.delete("array/foo")

    store.set("array/c/1/1/1", data)
    store.delete("array/c/10/1/1")  # out of grid: no-op
    store.delete("no/such/node/c/0/0/0")  # missing node: no-op
    store.delete("c/0")  # the root is a group, not an array: no-op
    store.delete("gone/zarr.json")  # missing node metadata: no-op
    assert store.get("array/c/1/1/1") == data

    # metadata delete stays idempotent
    store.delete("array/zarr.json")
    store.delete("array/zarr.json")
    assert store.get("array/zarr.json") is None


def test_set_out_of_grid_chunk_still_rejected(repo):
    s = _w(repo)
    s.create_array("/a", shape=[4], chunk_shape=[2])
    store = ChunkStore(s)
    store.set("a/c/1", b"ok")
    with pytest.raises(RefError, match="outside the chunk grid"):
        store.set("a/c/2", b"nope")
    with pytest.raises(RefError, match="outside the chunk grid"):
        store.set("a/c/0/0", b"rank mismatch")


def test_delete_dir_matrix(spark, repo):
    """delete_dir parity with store.rs test_delete_dir: node prefix
    drops the subtree; <array>/c[/coords] drops matching chunks only;
    non-node prefixes are no-ops."""
    s = _w(repo)
    store = ChunkStore(s)
    s.create_group("/group")
    s.create_array("/group/array", shape=[4, 4], chunk_shape=[2, 2])
    for k in ("0/0", "0/1", "1/0", "1/1"):
        store.set(f"group/array/c/{k}", b"x" * 8)

    store.delete_dir("group/array")
    assert store.get("group/array/zarr.json") is None

    s.create_array("/group/array", shape=[4, 4], chunk_shape=[2, 2])
    for k in ("0/0", "0/1", "1/0", "1/1"):
        store.set(f"group/array/c/{k}", b"x" * 8)
    store.delete_dir("group")
    assert store.get("group/zarr.json") is None
    assert store.get("group/array/zarr.json") is None

    s.create_group("/group")
    s.create_array("/group/array", shape=[4, 4], chunk_shape=[2, 2])
    for k in ("0/0", "0/1", "1/0", "1/1"):
        store.set(f"group/array/c/{k}", b"x" * 8)
    store.delete_dir("/group/array/c")  # leading slash intentional
    assert sorted(store.list_prefix("group/array")) == ["group/array/zarr.json"]

    for k in ("0/0", "0/1", "1/0", "1/1"):
        store.set(f"group/array/c/{k}", b"x" * 8)
    store.delete_dir("group/array/c/0")  # coordinate-prefix subtree
    assert sorted(store.list_prefix("group/array/c")) == [
        "group/array/c/1/0",
        "group/array/c/1/1",
    ]

    store.delete_dir("group/arr")  # not a node, no array ancestor: no-op
    store.delete_dir("nonexistent")  # no-op
    assert sorted(store.list_prefix("group/array/c")) == [
        "group/array/c/1/0",
        "group/array/c/1/1",
    ]


def test_delete_dir_node_prefix_never_lists_chunks(spark, repo, monkeypatch):
    """Deleting a whole-array prefix must short-circuit to ONE
    delete_node — never enumerate chunk keys on the driver (ADVICE r7:
    a 10^8-chunk array would OOM the driver)."""
    with repo.transaction(message="init") as s0:
        s0.create_array("/big", shape=[8], chunk_shape=[2])
    s = _w(repo)
    store = ChunkStore(s)
    for i in range(4):
        store.set(f"big/c/{i}", b"y" * 8)

    calls = {"delete_chunk": 0, "list": 0}
    orig_dc = type(s).delete_chunk
    monkeypatch.setattr(
        type(s), "delete_chunk",
        lambda self, *a, **k: (calls.__setitem__("delete_chunk", calls["delete_chunk"] + 1), orig_dc(self, *a, **k))[1],
    )
    orig_lp = ChunkStore.list_prefix
    monkeypatch.setattr(
        ChunkStore, "list_prefix",
        lambda self, *a, **k: (calls.__setitem__("list", calls["list"] + 1), orig_lp(self, *a, **k))[1],
    )
    store.delete_dir("big")
    assert calls == {"delete_chunk": 0, "list": 0}
    assert "/big" not in s.list_nodes()
    s.commit("dropped /big")
    assert "/big" not in repo.readonly_session().list_nodes()


def test_delete_dir_covers_descendants_of_non_node_prefix(spark, repo):
    """An array created WITHOUT a materialized parent group must still
    be removed by delete_dir on the parent prefix (review finding:
    the node short-circuit silently no-opped when the prefix itself
    was not a node but descendants existed)."""
    s = _w(repo)
    store = ChunkStore(s)
    s.create_array("/orphan/deep/arr", shape=[2], chunk_shape=[2])
    store.set("orphan/deep/arr/c/0", b"x" * 2)
    assert "/orphan" not in s._nodes  # precondition: parent not a node
    store.delete_dir("orphan")
    assert store.get("orphan/deep/arr/zarr.json") is None
    assert list(store.list_prefix("orphan")) == []


def test_delete_dir_rank_overflow_coords_is_noop(spark, repo):
    """Deleting a coordinate subtree DEEPER than the array's rank is
    an impossible key ⇒ no-op, not an AnalysisException (PR #2312
    contract; review finding on delete_chunks_prefix)."""
    s = _w(repo)
    store = ChunkStore(s)
    s.create_array("/a", shape=[4], chunk_shape=[2])
    store.set("a/c/0", b"x" * 2)
    store.delete_dir("a/c/0/0/0/0/0")  # rank overflow: no-op
    store.delete_dir("a/c/9")  # out-of-grid: no-op
    assert sorted(store.list_prefix("a/c")) == ["a/c/0"]
