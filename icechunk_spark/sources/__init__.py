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


def _spark_to_avro_schema(schema: StructType, name: str = "spark_row") -> dict:
    """Spark StructType -> Avro record schema (public Avro 1.11 type
    system; logical types for date/timestamp)."""
    from pyspark.sql import types as T

    def conv(dt, field_name):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": f"{field_name}_rec",
                "fields": [
                    {"name": f.name, "type": _nullable(conv(f.dataType, f.name), f.nullable)}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": _nullable(conv(dt.elementType, field_name), dt.containsNull),
            }
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "values": _nullable(conv(dt.valueType, field_name), dt.valueContainsNull),
            }
        simple = {
            T.LongType: "long",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.DoubleType: "double",
            T.FloatType: "float",
            T.StringType: "string",
            T.BinaryType: "bytes",
            T.BooleanType: "boolean",
        }
        if type(dt) in simple:
            return simple[type(dt)]
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        raise FormatUnavailable(f"avro fallback: unsupported Spark type {dt}")

    def _nullable(avro_t, nullable):
        return ["null", avro_t] if nullable else avro_t

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": _nullable(conv(f.dataType, f.name), f.nullable)}
            for f in schema.fields
        ],
    }


def _avro_to_spark_schema(avro: dict) -> StructType:
    from pyspark.sql import types as T

    def conv(a):
        if isinstance(a, list):  # union: nullability
            non_null = [b for b in a if b != "null"]
            if len(non_null) != 1:
                raise FormatUnavailable(f"avro fallback: general union {a} unsupported")
            dt, _ = conv(non_null[0])
            return dt, True
        t = a["type"] if isinstance(a, dict) else a
        logical = a.get("logicalType") if isinstance(a, dict) else None
        if logical == "date":
            return T.DateType(), False
        if logical == "timestamp-micros":
            return T.TimestampType(), False
        if logical == "local-timestamp-micros":
            return T.TimestampNTZType(), False
        simple = {
            "long": T.LongType(),
            "int": T.IntegerType(),
            "double": T.DoubleType(),
            "float": T.FloatType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
            "boolean": T.BooleanType(),
        }
        if t in simple:
            return simple[t], False
        if t == "record":
            return (
                T.StructType(
                    [T.StructField(f["name"], *_swap(conv(f["type"]))) for f in a["fields"]]
                ),
                False,
            )
        if t == "array":
            dt, n = conv(a["items"])
            return T.ArrayType(dt, containsNull=n), False
        if t == "map":
            dt, n = conv(a["values"])
            return T.MapType(T.StringType(), dt, valueContainsNull=n), False
        raise FormatUnavailable(f"avro fallback: unsupported avro type {a!r}")

    def _swap(pair):
        return pair  # (dataType, nullable) in StructField order

    if avro.get("type") != "record":
        raise FormatUnavailable("avro fallback: top-level schema must be a record")
    return T.StructType(
        [T.StructField(f["name"], *conv(f["type"])) for f in avro["fields"]]
    )


def read_avro(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """Avro read.  Preferred path: the external spark-avro module
    (JVM-side scan with pushdown).  Fallback when the jar is absent:
    the pure-Python container codec (avro_codec.py) behind a
    binaryFile scan + Arrow-batched mapInPandas decode — files are
    decoded in executors (one task per file; a 100 TB avro lake is
    many files, so parallelism is the file count), only one file
    HEADER is read driver-side for schema discovery."""
    if _avro_available(spark):
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.format("avro").load(path)
    from icechunk_spark.sources import avro_codec

    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    )
    if schema is None:
        first = files.select("path").orderBy("path").limit(1).collect()
        if not first:
            raise FormatUnavailable(f"no .avro files under {path}")
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(first[0]["path"])
        with fs.open_input_file(p) as f:
            head = f.read(1 << 20)
        spark_schema = _avro_to_spark_schema(avro_codec.read_schema(head))
    else:
        from pyspark.sql.types import _parse_datatype_string

        spark_schema = (
            _parse_datatype_string(schema) if isinstance(schema, str) else schema
        )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for payload in pdf["content"]:
                _, records = avro_codec.read_container(bytes(payload))
                frames.append(
                    _avro_records_to_pandas(records, spark_schema)
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.select("content").mapInPandas(decode, schema=spark_schema)


def _avro_records_to_pandas(records, spark_schema):
    """Avro-native record dicts -> a pandas frame matching the Spark
    schema (datetimes back from micros, dates from day counts)."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql import types as T

    cols = {}
    for f in spark_schema.fields:
        vals = [r.get(f.name) for r in records]
        if isinstance(f.dataType, T.TimestampType) or isinstance(
            f.dataType, T.TimestampNTZType
        ):
            vals = pd.to_datetime(
                pd.Series(vals, dtype="object").astype("Int64"), unit="us"
            )
        elif isinstance(f.dataType, T.DateType):
            vals = [
                None if v is None else _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
                for v in vals
            ]
        cols[f.name] = vals
    return pd.DataFrame(cols, columns=[f.name for f in spark_schema.fields])


def write_avro(df: DataFrame, path: str, *, codec: str = "deflate") -> None:
    """Avro write.  Preferred: spark-avro (JVM sink).  Fallback: each
    partition's Arrow batches are encoded by the pure-Python codec and
    written from the EXECUTOR as ``part-{pid:05d}.avro`` (deterministic
    names, so a retried task overwrites rather than duplicates); the
    driver sees only a one-row-per-partition manifest."""
    if _avro_available(df.sparkSession):
        df.write.mode("overwrite").format("avro").save(path)
        return
    if codec not in ("null", "deflate"):
        raise FormatUnavailable(f"avro fallback: unsupported codec {codec!r}")
    from icechunk_spark.sources import avro_codec

    avro_schema = _spark_to_avro_schema(df.schema)
    spark_schema = df.schema
    import pyarrow.fs as pafs

    fs, base = pafs.FileSystem.from_uri(path)
    try:  # overwrite semantics, like the JVM sink's mode("overwrite")
        fs.delete_dir(base)
    except (FileNotFoundError, OSError):
        pass
    fs.create_dir(base, recursive=True)

    def encode(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = [p for p in batches]
        n = 0
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            records = _pandas_to_avro_records(pdf, spark_schema)
            payload = avro_codec.write_container(records, avro_schema, codec=codec)
            out_fs, out_base = pafs.FileSystem.from_uri(path)
            # task-commit safety (ADVICE r7): a speculative duplicate or
            # a zombie retry racing this task must never interleave on
            # the final stream.  Write to an ATTEMPT-UNIQUE temp name,
            # then rename — whichever attempt renames last leaves a
            # complete file; mid-job failures leave only .tmp litter
            # that read_avro's *.avro glob never sees.
            attempt = TaskContext.get().taskAttemptId()
            tmp = f"{out_base}/.part-{pid:05d}-{attempt}.avro.tmp"
            final = f"{out_base}/part-{pid:05d}.avro"
            with out_fs.open_output_stream(tmp) as f:
                f.write(payload)
            out_fs.move(tmp, final)
            n = len(records)
        yield pd.DataFrame({"partition": [pid], "n_records": [n]})

    manifest = df.mapInPandas(encode, schema="partition int, n_records long")
    rows = manifest.collect()  # bounded: one row per partition
    if sum(r["n_records"] for r in rows) == 0:
        # JVM-sink parity: an empty frame still produces a readable
        # schema-only container file (read_avro returns 0 rows with
        # the right schema instead of erroring)
        with fs.open_output_stream(f"{base}/part-empty.avro") as f:
            f.write(avro_codec.write_container([], avro_schema, codec=codec))


def _pandas_to_avro_records(pdf, spark_schema):
    """Pandas frame -> avro-native record dicts (timestamps to micros,
    dates to day counts, numpy scalars to Python)."""
    import datetime as _dt

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    converted = {}
    for f in spark_schema.fields:
        s = pdf[f.name]
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            s = pd.to_datetime(s)
            vals = [
                None if pd.isna(v) else int(v.value // 1000) for v in s
            ]
        elif isinstance(f.dataType, T.DateType):
            vals = [
                None
                if v is None or (isinstance(v, float) and np.isnan(v))
                else (pd.Timestamp(v).date() - _dt.date(1970, 1, 1)).days
                for v in s
            ]
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            vals = [None if v is None else v for v in s]
        else:
            # Arrow->pandas renders nullable ints as float64 + NaN, so
            # scalar NaN means SQL NULL for every primitive type
            vals = [
                None
                if v is None
                or (
                    not isinstance(v, (bytes, str, list, dict, np.ndarray))
                    and pd.isna(v)
                )
                else (v.item() if hasattr(v, "item") else v)
                for v in s
            ]
        converted[f.name] = vals
    names = [f.name for f in spark_schema.fields]
    return [
        {k: converted[k][i] for k in names} for i in range(len(pdf))
    ]


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
