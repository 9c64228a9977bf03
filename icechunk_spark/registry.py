"""Central registry: collects QUERIES/ORACLES from every operator
module.  ``__spark_entry__.queries()`` / ``oracle_sql()`` delegate here.

A query with no oracle entry gets the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops — LSH/ANN internals,
streaming, repo version-control operations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from icechunk_spark.operators import tpch

    mods = [tpch]
    for name in ("tpch_ext", "analytics_ext", "windows", "dedup", "similarity", "textstats", "textquality", "pipeline_ext", "corpus_ext", "multimodal", "repo_queries", "streaming_queries"):
        try:
            mods.append(__import__(f"icechunk_spark.operators.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
