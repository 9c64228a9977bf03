"""Oracle parity for every SQL-expressible operator at sf0.001 —
the same gate the driver runs at sf0.01 (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from icechunk_spark.registry import all_oracles, all_queries
from icechunk_spark.testing import compare, duck_connection

from .conftest import SF_DIR

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    problems = compare(spark, duck, QUERIES[name], ORACLES[name], SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_no_rows_only_queries():
    """Every registered query is value-verified: the set of queries
    with only the weaker rows-only check is EMPTY.  (If a genuinely
    non-SQL-expressible op ever lands without an oracle, re-add the
    parametrized rows-only runner here for it.)"""
    assert set(QUERIES) == set(ORACLES)


def test_every_query_has_inventory_entry():
    # every declared query must be exposed through __spark_entry__
    import __spark_entry__ as entrymod

    assert set(entrymod.queries()) == set(QUERIES)
    assert set(entrymod.oracle_sql()) == set(ORACLES)
    assert set(ORACLES) <= set(QUERIES)
