"""Sources & sinks beyond parquet (SURVEY.md §2h): schema-projected
CSV / JSON readers and partitioned parquet writes.

Readers take explicit schemas (never inferSchema at scale — schema
inference is a full extra pass over the data) and are plain wrappers
over the Spark DataSource API so pushdown/pruning behave exactly as
for parquet scans where the format supports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.option("header", str(header).lower()).mode("overwrite").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partitioned layout — the unit of partition pruning
    for downstream readers."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC read (built into Spark; predicate pushdown + column pruning
    work as for parquet)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
