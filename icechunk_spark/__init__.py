"""icechunk_spark — a PySpark-native rebuild of the capabilities of
earth-mover/icechunk (transactional, versioned chunk storage) plus the
analytics / LLM-data-pipeline operator layer that runs on top of it.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, parquet for all data-plane state, Pandas UDFs only where the
built-in operators genuinely cannot express the semantics.
"""

from icechunk_spark.engine import get_spark
from icechunk_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables", "print_debug_info"]
__version__ = "0.1.0"


def print_debug_info() -> None:
    """Environment report for bug reports (reference parity:
    icechunk.print_debug_info)."""
    import platform
    from importlib import import_module

    print(f"platform:  {platform.platform()}")
    print(f"python:  {platform.python_version()}")
    print(f"icechunk_spark:  {__version__}")
    for package in ["pyspark", "pyarrow", "pandas", "numpy", "duckdb"]:
        try:
            print(f"{package}:  {import_module(package).__version__}")
        except ModuleNotFoundError:
            continue
