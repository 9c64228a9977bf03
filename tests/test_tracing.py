"""Opt-in tracing export (reference 2.1.0 PR #2234 analog): spans for
the coarse repo ops land in ICECHUNK_TRACE_FILE as JSONL; with neither
env var set tracing is a no-op."""

from __future__ import annotations

import json

import pytest

from icechunk_spark import tracing
from icechunk_spark.repo import Repository


def test_off_by_default(monkeypatch):
    monkeypatch.delenv("ICECHUNK_TRACE_FILE", raising=False)
    monkeypatch.delenv("ICECHUNK_OTLP_ENDPOINT", raising=False)
    monkeypatch.delenv("OTEL_EXPORTER_OTLP_ENDPOINT", raising=False)
    assert not tracing.enabled()
    with tracing.span("noop"):  # must not write anywhere or raise
        pass


def test_commit_and_gc_spans_export_jsonl(spark, tmp_path, monkeypatch):
    trace = tmp_path / "spans.jsonl"
    monkeypatch.setenv("ICECHUNK_TRACE_FILE", str(trace))
    repo = Repository.create(spark, str(tmp_path / "traced"))
    with repo.transaction(message="init") as s:
        s.create_array("/a", shape=[4], chunk_shape=[2])
    repo.garbage_collect(dry_run=True, older_than_seconds=0)

    spans = [json.loads(line) for line in trace.read_text().splitlines()]
    names = [s["name"] for s in spans]
    assert "icechunk.commit" in names
    assert "icechunk.garbage_collect" in names
    commit = next(s for s in spans if s["name"] == "icechunk.commit")
    assert commit["status"] == "ok"
    assert commit["attributes"]["branch"] == "main"
    assert commit["duration_ms"] > 0
    assert commit["end"] >= commit["start"]


def test_error_spans_record_status(spark, tmp_path, monkeypatch):
    trace = tmp_path / "err.jsonl"
    monkeypatch.setenv("ICECHUNK_TRACE_FILE", str(trace))
    repo = Repository.create(spark, str(tmp_path / "traced_err"))
    w = repo.writable_session("main")
    with pytest.raises(Exception):  # noqa: B017 — empty commit refuses
        w.commit("nothing staged")
    spans = [json.loads(line) for line in trace.read_text().splitlines()]
    err = [s for s in spans if s["name"] == "icechunk.commit" and s["status"] == "error"]
    assert err and err[0]["attributes"]["error_type"] == "IcechunkError"
