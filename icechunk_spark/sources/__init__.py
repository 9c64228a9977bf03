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


def read_text_corpus(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw-text ingestion for training corpora: ``wholetext=False``
    yields one row per line (columns: value), ``True`` one row per
    file — the usual first step before cleaning/dedup.  Adds the
    source file path so downstream provenance (shard_assign,
    mixture_sample) has a grouping key.  Splittable line mode scales
    to any file count; whole-file mode keeps each document intact for
    document-level operators."""
    from pyspark.sql import functions as F

    df = spark.read.text(path, wholetext=whole_file)
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal payload ingestion via Spark's ``binaryFile`` source:
    (path, modificationTime, length, content) — content is the opaque
    binary column operators/multimodal.py decodes with mapInPandas.
    ``pathGlobFilter`` prunes by extension at the LISTING, before any
    bytes are read."""
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


class FormatUnavailable(RuntimeError):
    """The Spark deployment lacks the external module for a format."""


def _avro_available(spark: SparkSession) -> bool:
    # probe the registered V2 provider, not AvroFileFormat — core Spark
    # ships a few avro classes while the actual data source lives in
    # the external spark-avro module
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.v2.avro.AvroDataSourceV2"
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """Avro read.  Avro has been an EXTERNAL Spark module since 2.4
    (spark-avro jar via --packages); this container's pyspark ships
    without it, so the helper degrades to a typed capability error
    instead of Spark's opaque ClassNotFound."""
    if not _avro_available(spark):
        raise FormatUnavailable(
            "avro support requires the spark-avro module "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "not present in this deployment"
        )
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.format("avro").load(path)


def write_avro(df: DataFrame, path: str) -> None:
    if not _avro_available(df.sparkSession):
        raise FormatUnavailable(
            "avro support requires the spark-avro module "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>); "
            "not present in this deployment"
        )
    df.write.mode("overwrite").format("avro").save(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    shard_by: str = "doc_id",
    n_shards: int = 64,
    compression: str = "gzip",
) -> None:
    """Training-export sink: the cleaned corpus as deterministic,
    size-balanced JSONL shards (``shard=NNNN`` hive dirs of
    ``.json.gz`` part files) — the handoff format tokenizer and
    training loaders consume.

    Deterministic by construction: a row's shard is
    ``crc32(shard_by) % n_shards``, so re-running the export after an
    upstream change moves only the rows that changed, and two engines
    producing the same corpus produce byte-identical shard membership
    (the same property the dedup/split operators get from md5).

    Scale: one hash + one shuffle by shard id; each shard writes in
    parallel.  Raise ``n_shards`` with corpus size so a shard stays
    in the low-GB range (loader-friendly, retry-friendly).
    """
    from pyspark.sql import functions as F

    out = df.withColumn(
        "shard", (F.crc32(F.col(shard_by).cast("string")) % n_shards).cast("int")
    )
    (
        out.repartition("shard")
        .write.partitionBy("shard")
        .option("compression", compression)
        .mode("overwrite")
        .json(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read back a write_training_shards export (schema-projected; the
    ``shard`` partition column is available for pruning a subset of
    shards)."""
    return spark.read.schema(schema).option("basePath", path).json(f"{path}/shard=*")
