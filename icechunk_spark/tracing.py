"""Opt-in tracing export (reference parity: icechunk 2.1.0, PR #2234 —
"experimental OpenTelemetry export: when ICECHUNK_OTLP_ENDPOINT or
OTEL_EXPORTER_OTLP_ENDPOINT are set, tracing spans are exported over
OTLP/gRPC.  Off by default").

This environment has no OpenTelemetry SDK and no collector, so the
export surface is pluggable behind the same opt-in contract:

- ``ICECHUNK_TRACE_FILE=<path>``  → spans append to a JSONL file
  (one object per span: name, trace id, start/end epoch seconds,
  duration_ms, attributes, status).
- ``ICECHUNK_OTLP_ENDPOINT`` / ``OTEL_EXPORTER_OTLP_ENDPOINT`` → if
  the ``opentelemetry`` SDK is importable, spans are re-emitted
  through it; otherwise a one-time warning explains the SDK is absent
  and the JSONL sink (if configured) still runs.
- neither set → tracing is OFF: ``span()`` short-circuits on a
  module flag with no allocation beyond one ``if``.

Spans cover the coarse repo operations (commit, flush, rebase, GC,
expire, rewrite_manifests) — the ops a 100 TB deployment alerts on —
never per-chunk hot paths.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from contextlib import contextmanager

_lock = threading.Lock()
_warned_no_sdk = False


def _trace_file() -> "str | None":
    return os.environ.get("ICECHUNK_TRACE_FILE") or None


def _otlp_endpoint() -> "str | None":
    return (
        os.environ.get("ICECHUNK_OTLP_ENDPOINT")
        or os.environ.get("OTEL_EXPORTER_OTLP_ENDPOINT")
        or None
    )


def enabled() -> bool:
    return bool(_trace_file() or _otlp_endpoint())


def _emit(rec: dict) -> None:
    path = _trace_file()
    if path:
        line = json.dumps(rec, separators=(",", ":"), default=str)
        with _lock:
            with open(path, "a") as f:
                f.write(line + "\n")
    endpoint = _otlp_endpoint()
    if endpoint:
        try:
            from opentelemetry import trace as _ot  # noqa: F401

            tracer = _ot.get_tracer("icechunk_spark")
            with tracer.start_as_current_span(rec["name"]) as s:
                for k, v in rec.get("attributes", {}).items():
                    s.set_attribute(str(k), v)
        except ImportError:
            global _warned_no_sdk
            if not _warned_no_sdk:
                _warned_no_sdk = True
                import sys

                print(
                    "icechunk_spark.tracing: OTLP endpoint configured but the "
                    "opentelemetry SDK is not installed; spans go to "
                    "ICECHUNK_TRACE_FILE only",
                    file=sys.stderr,
                )


@contextmanager
def span(name: str, **attributes):
    """Trace one operation.  A no-op (one ``if``) unless tracing is
    opted into via the env vars above — the reference's off-by-default
    contract."""
    if not enabled():
        yield
        return
    rec = {
        "name": name,
        "trace_id": uuid.uuid4().hex,
        "start": time.time(),
        "attributes": {k: v for k, v in attributes.items() if v is not None},
        "status": "ok",
    }
    try:
        yield
    except BaseException as e:
        rec["status"] = "error"
        rec["attributes"]["error_type"] = type(e).__name__
        raise
    finally:
        rec["end"] = time.time()
        rec["duration_ms"] = round((rec["end"] - rec["start"]) * 1000.0, 3)
        try:
            _emit(rec)
        except Exception:
            pass  # tracing must never fail the traced operation


def traced(name: str):
    """Decorator form of :func:`span` for whole methods (coarse repo
    maintenance ops).  Zero overhead beyond one ``if`` when tracing is
    off."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with span(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco
