"""tools/check.py gate-credit behaviors: local re-gates are recorded
module-hash-pinned, revoked on failure, and only count toward the
staleness budget at driver-gate scale factors."""

from __future__ import annotations

import importlib.util
import json
import sys


def _load_check():
    spec = importlib.util.spec_from_file_location("check_tool", "/root/repo/tools/check.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["check_tool"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_record_and_revoke_local_gates(tmp_path):
    check = _load_check()
    repo = str(tmp_path)
    check._record_local_gates(
        repo,
        {"q_a": {"module_md5": "m1", "sf_dir": "/t/sf0.01", "kind": "oracle"}},
    )
    gates = json.load(open(tmp_path / "LOCALGATES.json"))
    assert gates["q_a"]["module_md5"] == "m1"

    # a later failing run REVOKES the credit even with no new passes
    check._record_local_gates(repo, {}, failed={"q_a"})
    gates = json.load(open(tmp_path / "LOCALGATES.json"))
    assert "q_a" not in gates

    # pass + unrelated failure: only the failure is dropped
    check._record_local_gates(
        repo,
        {"q_b": {"module_md5": "m2", "sf_dir": "/t/sf0.1", "kind": "oracle"}},
        failed={"q_c"},
    )
    gates = json.load(open(tmp_path / "LOCALGATES.json"))
    assert list(gates) == ["q_b"]


def test_sf_floor_parsing():
    check = _load_check()
    assert check._sf_of("/root/testdata/sf0.001") == 0.001
    assert check._sf_of("/root/testdata/sf0.01/") == 0.01
    assert check._sf_of("/tmp/sf10_synth") == 10.0
    assert check._sf_of("/weird/dir") == 0.0
    # the budget requires >= 0.01: smoke SFs must not satisfy it
    assert check._sf_of("/root/testdata/sf0.001") < 0.01
    assert check._sf_of("/root/testdata/sf0.01") >= 0.01


def test_file_md5_missing_is_none(tmp_path):
    check = _load_check()
    assert check._file_md5(str(tmp_path / "nope.py")) is None
    p = tmp_path / "m.py"
    p.write_text("x = 1\n")
    h1 = check._file_md5(str(p))
    p.write_text("x = 2\n")
    assert check._file_md5(str(p)) != h1


def test_smaller_sf_run_does_not_downgrade_credit(tmp_path):
    check = _load_check()
    repo = str(tmp_path)
    check._record_local_gates(
        repo, {"q": {"module_md5": "m", "sf_dir": "/t/sf0.1", "kind": "oracle"}}
    )
    # later smoke pass at sf0.001, same module: the sf0.1 credit stays
    check._record_local_gates(
        repo, {"q": {"module_md5": "m", "sf_dir": "/t/sf0.001", "kind": "oracle"}}
    )
    gates = json.load(open(tmp_path / "LOCALGATES.json"))
    assert gates["q"]["sf_dir"] == "/t/sf0.1"
    # but a CHANGED module takes the new record whatever its sf
    check._record_local_gates(
        repo, {"q": {"module_md5": "m2", "sf_dir": "/t/sf0.001", "kind": "oracle"}}
    )
    gates = json.load(open(tmp_path / "LOCALGATES.json"))
    assert gates["q"]["module_md5"] == "m2"
