from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from icechunk_spark.engine import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute scale probes (run in the full suite)"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("icechunk-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
