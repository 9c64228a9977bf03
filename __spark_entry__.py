"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
every implemented operator from SURVEY.md §2 with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from icechunk_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from icechunk_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    from icechunk_spark.registry import all_oracles

    return all_oracles()
