"""read_headers/write_headers storage parity (reference
storage.py:202-343, Changelog 2.1.1 #2246) and the quoted-ETag CAS
contract (Changelog 2.1.2 #2289).

The header tests run a REAL local HTTP endpoint and a REAL boto3
client so the before-send injection is exercised end-to-end — a fake
client would bypass botocore's event system entirely.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from icechunk_spark.repo.storage import (
    ArrowFsStorage,
    StorageConflict,
    gcs_storage,
    r2_storage,
    s3_storage,
    tigris_storage,
)


@pytest.fixture()
def fake_endpoint():
    """A local HTTP object-store stand-in that records every request's
    (method, headers) and returns success; yields (url, requests)."""
    requests: list[tuple[str, dict]] = []

    class Handler(BaseHTTPRequestHandler):
        def _record(self):
            requests.append((self.command, dict(self.headers)))

        def do_PUT(self):
            self._record()
            length = int(self.headers.get("Content-Length", 0))
            self.rfile.read(length)
            self.send_response(200)
            self.send_header("ETag", '"d41d8cd98f00b204e9800998ecf8427e"')
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_GET(self):
            self._record()
            body = b"{}"
            self.send_response(200)
            self.send_header("ETag", '"d41d8cd98f00b204e9800998ecf8427e"')
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence stderr
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", requests
    finally:
        srv.shutdown()


def test_write_headers_reach_the_endpoint(fake_endpoint):
    url, requests = fake_endpoint
    st = s3_storage(
        "bkt",
        "repo",
        endpoint_url=url,
        region="us-east-1",
        access_key_id="k",
        secret_access_key="s",
        headers={"X-Both": "b", "X-Override": "base"},
        write_headers={"X-Write": "w", "X-Override": "write-wins"},
        read_headers={"X-Read": "r"},
    )
    st.put("refs/h.json", b"{}", if_none_match=True)
    assert len(requests) == 1
    method, hs = requests[0]
    assert method == "PUT"
    assert hs.get("X-Write") == "w"
    assert hs.get("X-Both") == "b"  # plain headers apply to writes too
    assert hs.get("X-Override") == "write-wins"  # write_headers precedence
    assert "X-Read" not in hs  # read headers never leak onto writes


def test_read_headers_reach_the_endpoint(fake_endpoint):
    import boto3

    url, requests = fake_endpoint
    st = s3_storage(
        "bkt",
        "repo",
        endpoint_url=url,
        region="us-east-1",
        access_key_id="k",
        secret_access_key="s",
        read_headers={"X-Read": "r"},
        write_headers={"X-Write": "w"},
    )
    client = boto3.client(
        "s3",
        endpoint_url=url,
        region_name="us-east-1",
        aws_access_key_id="k",
        aws_secret_access_key="s",
    )
    st._register_header_injection(client)
    client.get_object(Bucket="bkt", Key="repo/refs/h.json")
    method, hs = requests[-1]
    assert method == "GET"
    assert hs.get("X-Read") == "r"
    assert "X-Write" not in hs


def test_factories_accept_and_merge_headers():
    """Signature parity: s3/tigris/r2/gcs all take read_headers /
    write_headers / headers (reference storage.py:202-343) and merge
    with per-key precedence to the read/write variants."""
    for factory, kwargs in [
        (s3_storage, {}),
        (tigris_storage, {}),
        (r2_storage, {"account_id": "acct"}),
    ]:
        st = factory(
            "bkt",
            "p",
            anonymous=True,
            headers={"A": "1", "B": "base"},
            read_headers={"B": "read"},
            write_headers={"C": "3"},
            **kwargs,
        )
        assert st._read_headers == {"A": "1", "B": "read"}
        assert st._write_headers == {"A": "1", "B": "base", "C": "3"}
    g = gcs_storage("bkt", "p", headers={"A": "1"}, write_headers={"C": "3"})
    assert g._read_headers == {"A": "1"}
    assert g._write_headers == {"A": "1", "C": "3"}


def test_no_headers_is_zero_overhead(fake_endpoint):
    """Without headers the injection registers NOTHING — fakes without
    .meta (the other storage tests) and hot paths stay untouched."""
    url, requests = fake_endpoint
    st = s3_storage(
        "bkt", "repo", endpoint_url=url, region="us-east-1",
        access_key_id="k", secret_access_key="s",
    )
    assert st._read_headers == {} and st._write_headers == {}

    class NoMeta:  # would raise AttributeError if touched
        pass

    st._register_header_injection(NoMeta())  # must not blow up


# ---------------------------------------------------------------------------
# quoted-ETag CAS contract (Changelog 2.1.2 #2289): S3 returns ETags
# WITH surrounding quotes; a CAS that compared quoted vs unquoted forms
# could 412 against its own write forever (endless commit retries).
# This repo's CAS never compares ETags (IfNoneMatch='*' + write-id
# read-back), so a quoted-ETag backend must terminate in ≤1 retry.
# ---------------------------------------------------------------------------


def test_quoted_etag_backend_cannot_loop_commit_retries(tmp_path, monkeypatch):
    import boto3
    import botocore.exceptions

    root = tmp_path / "bucket" / "repo"
    attempts = []

    class QuotedEtagS3:
        """Stores objects on disk; every response carries a QUOTED
        ETag (as real S3 does); the first conditional put's success
        response is 'lost' — the caller sees the SDK retry's 412."""

        def put_object(self, *, Bucket, Key, Body, IfNoneMatch):
            attempts.append(Key)
            # _bucket_and_key splits the absolute file path: the first
            # component is the 'bucket' — reassemble to store on disk
            # where the pyarrow read-back plane will look
            from pathlib import Path

            path = Path("/") / Bucket / Key
            if path.exists():
                raise botocore.exceptions.ClientError(
                    {
                        "Error": {"Code": "PreconditionFailed"},
                        "ResponseMetadata": {
                            "HTTPHeaders": {"etag": '"ab12"'}
                        },
                    },
                    "PutObject",
                )
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_bytes(bytes(Body))
            # lost success: the write LANDED but the caller observes a
            # precondition failure (SDK-internal retry against our own
            # object) — with a quoted ETag in the error details
            raise botocore.exceptions.ClientError(
                {
                    "Error": {"Code": "PreconditionFailed"},
                    "ResponseMetadata": {"HTTPHeaders": {"etag": '"ab12"'}},
                },
                "PutObject",
            )

    monkeypatch.setattr(boto3, "client", lambda svc, **kw: QuotedEtagS3())
    st = ArrowFsStorage(f"file://{root}")
    st._scheme = "s3"

    # lost success + quoted ETags: recognized as OUR write, no loop
    st.put_json_cas("refs/tag.v1/ref.json", {"snapshot_id": "abc"})
    assert len(attempts) == 1  # exactly one put, no retry loop
    assert attempts[0].endswith("repo/refs/tag.v1/ref.json")
    assert json.loads((root / "refs/tag.v1/ref.json").read_bytes())[
        "snapshot_id"
    ] == "abc"

    # a REAL conflict still surfaces as one — again without retrying
    n_before = len(attempts)
    with pytest.raises(StorageConflict):
        st.put_json_cas("refs/tag.v1/ref.json", {"snapshot_id": "other"})
    assert len(attempts) == n_before + 1
