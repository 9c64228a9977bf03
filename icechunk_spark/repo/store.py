"""Zarr-style key/value store facade over a Session — the analog of
IcechunkStore (icechunk-python/python/icechunk/store.py).

Keys: ``<path>/zarr.json`` (node metadata documents) and
``<path>/c/<i>/<j>/...`` (chunk payloads).  Listing walks the node
table plus the resolved manifest.
"""

from __future__ import annotations

import json
from typing import Iterator

from icechunk_spark.repo.format import RefError
from icechunk_spark.repo.session import Session


class ChunkStore:
    def __init__(self, session: Session):
        self.session = session

    # --- capability flags (store.py parity) -------------------------------

    @property
    def supports_writes(self) -> bool:
        return not self.session.read_only

    @property
    def supports_deletes(self) -> bool:
        return not self.session.read_only

    @property
    def supports_partial_writes(self) -> bool:
        return False

    @property
    def supports_listing(self) -> bool:
        return True

    # --- key codec --------------------------------------------------------

    @staticmethod
    def _parse(key: str) -> tuple[str, str | None]:
        """Return (node_path, chunk_key|None); None means metadata doc."""
        if key.endswith("zarr.json"):
            p = key[: -len("zarr.json")].rstrip("/")
            return "/" + p, None
        if "/c/" in key or key.startswith("c/"):
            path, _, coords = key.partition("/c/") if "/c/" in key else ("", "c", key[2:])
            return "/" + path, coords.replace("/", ".")
        raise RefError(f"unrecognized store key: {key}")

    # --- byte API ---------------------------------------------------------

    def get(self, key: str) -> bytes | None:
        path, chunk = self._parse(key)
        if chunk is None:
            try:
                node = self.session._node(path)
            except RefError:
                return None
            return json.dumps(node).encode()
        return self.session.get_chunk_bytes(path, chunk)

    def set(self, key: str, value: bytes) -> None:
        path, chunk = self._parse(key)
        if chunk is None:
            doc = json.loads(value)
            if doc.get("kind") == "array" or doc.get("node_type") == "array":
                self.session.create_array(
                    path,
                    shape=doc["shape"],
                    chunk_shape=doc.get("chunk_shape") or doc["chunk_grid"]["configuration"]["chunk_shape"],
                    dtype=doc.get("dtype", "float64"),
                    fill_value=doc.get("fill_value", 0.0),
                    attrs=doc.get("attrs") or doc.get("attributes") or {},
                )
            else:
                self.session.create_group(path, attrs=doc.get("attrs") or doc.get("attributes") or {})
            return
        self.session.set_chunk_bytes(path, chunk, value)

    def exists(self, key: str) -> bool:
        return self.get(key) is not None

    def get_partial_values(
        self, key_ranges: list[tuple[str, tuple[int | None, int | None]]]
    ) -> list[bytes | None]:
        """Byte-range reads: (key, (offset, length)); None offset = 0,
        None length = to end (store.py:get_partial_values)."""
        out: list[bytes | None] = []
        for key, (offset, length) in key_ranges:
            raw = self.get(key)
            if raw is None:
                out.append(None)
                continue
            start = offset or 0
            end = len(raw) if length is None else start + length
            out.append(raw[start:end])
        return out

    def set_if_not_exists(self, key: str, value: bytes) -> None:
        if not self.exists(key):
            self.set(key, value)

    def is_empty(self, prefix: str = "") -> bool:
        return next(iter(self.list_prefix(prefix)), None) is None

    def delete(self, key: str) -> None:
        path, chunk = self._parse(key)
        if chunk is None:
            self.session.delete_node(path)
        else:
            self.session.delete_chunk(path, chunk)

    def delete_dir(self, prefix: str) -> None:
        """Delete every key under a prefix (store.py:delete_dir)."""
        for key in list(self.list_prefix(prefix.rstrip("/") + "/")):
            try:
                self.delete(key)
            except RefError:
                pass

    def sync_clear(self) -> None:
        for p in [p for p in self.session.list_nodes() if p != "/"]:
            try:
                self.session.delete_node(p)
            except RefError:
                pass

    # --- listing ----------------------------------------------------------

    def list(self) -> Iterator[str]:
        yield from self.list_prefix("")

    def list_prefix(self, prefix: str) -> Iterator[str]:
        for key in self._all_keys():
            if key.startswith(prefix):
                yield key

    def list_dir(self, prefix: str) -> Iterator[str]:
        prefix = prefix.rstrip("/")
        seen = set()
        plen = len(prefix) + 1 if prefix else 0
        for key in self._all_keys():
            if prefix and not key.startswith(prefix + "/"):
                continue
            head = key[plen:].split("/")[0]
            if head not in seen:
                seen.add(head)
                yield head

    def list_keys_df(self):
        """Chunk keys as a DataFrame (path-sorted) — the bulk listing
        surface; ``list()``/``_all_keys`` stream this with
        toLocalIterator so a 10^8-chunk manifest never materializes on
        the driver."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import broadcast

        from icechunk_spark.engine import local_df

        nodes = self.session.list_nodes()
        id_to_path = {self.session._nodes[p]["node_id"]: p.lstrip("/") for p in nodes}
        paths = local_df(
            self.session.spark,
            [(nid, p) for nid, p in id_to_path.items()],
            "node_id string, path string",
        )
        return (
            self.session.chunk_manifest_df()
            .select("node_id", "chunk_key")
            .join(broadcast(paths), "node_id")
            .select(
                F.concat_ws(
                    "/",
                    F.when(F.col("path") != "", F.concat(F.col("path"), F.lit("/c"))).otherwise("c"),
                    F.translate("chunk_key", ".", "/"),
                ).alias("key")
            )
            .orderBy("key")
        )

    def _all_keys(self) -> Iterator[str]:
        nodes = self.session.list_nodes()
        for p in sorted(nodes):
            yield (p.lstrip("/") + "/zarr.json").lstrip("/")
        # stream, don't collect: partitions arrive one at a time
        for r in self.list_keys_df().toLocalIterator():
            yield r["key"]
