from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.sources import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_partitioned_parquet,
)

from .conftest import SF_DIR

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def test_csv_roundtrip(spark, tmp_path):
    orders = load_tables(spark, SF_DIR)["orders"]
    p = str(tmp_path / "orders_csv")
    write_csv(orders, p)
    back = read_csv(spark, p, ORDERS_SCHEMA)
    assert back.count() == orders.count()
    assert dict(back.dtypes)["o_totalprice"] == "double"
    assert back.agg(F.sum("o_totalprice")).collect()[0][0] == (
        orders.agg(F.sum("o_totalprice")).collect()[0][0]
    )


def test_json_roundtrip(spark, tmp_path):
    orders = load_tables(spark, SF_DIR)["orders"]
    p = str(tmp_path / "orders_json")
    write_json(orders, p)
    back = read_json(spark, p, ORDERS_SCHEMA)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_tables(spark, SF_DIR)["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, p, "o_year")
    back = spark.read.parquet(p).filter(F.col("o_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a partition filter, and the
    # result must match a plain filter over the unpartitioned data
    assert "PartitionFilters: [" in plan and "o_year" in plan
    expected = orders.filter(F.col("o_year") == 1997).count()
    assert back.count() == expected


def test_rate_stream_source(spark):
    # smoke the rate source: bounded drain via one processing trigger
    df = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    q = (
        df.writeStream.format("memory")
        .queryName("rate_smoke")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    time.sleep(3)
    q.stop()
    q.awaitTermination()
    assert spark.table("rate_smoke").columns == ["timestamp", "value"]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from icechunk_spark.sources import read_orc, write_orc

    orders = load_tables(spark, SF_DIR)["orders"]
    p = str(tmp_path / "orders_orc")
    write_orc(orders.select("o_orderkey", "o_totalprice", "o_orderpriority"), p)
    back = read_orc(spark, p).filter(F.col("o_totalprice") > 100000.0)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
    expected = orders.filter(F.col("o_totalprice") > 100000.0).count()
    assert back.count() == expected


def test_avro_roundtrip(spark, tmp_path):
    """Avro read/write works with OR without the external spark-avro
    jar: with it, the JVM sink/scan; without, the pure-Python container
    codec behind binaryFile + mapInPandas (sources/avro_codec.py).
    Either way the roundtrip must preserve values and types."""
    from pyspark.sql import functions as F

    from icechunk_spark.sources import read_avro, write_avro

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("s"), F.col("id")).alias("name"),
        (F.col("id") % 2 == 0).alias("even"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("int"))
        .alias("maybe"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.to_date(F.lit("2024-03-01")).alias("d"),
        F.lit("2024-03-01 12:30:00").cast("timestamp_ntz").alias("ts"),
    )
    p = str(tmp_path / "a")
    write_avro(df, p)
    back = read_avro(spark, p)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r["k"])
    b = sorted(back.collect(), key=lambda r: r["k"])
    assert a == b


def test_avro_codec_binary_format(tmp_path):
    """The fallback codec writes SPEC-conformant container files:
    magic, schema metadata, sync-marker framing, deflate blocks —
    re-parsed from raw bytes, not via the writer's own state."""
    from icechunk_spark.sources import avro_codec

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "m", "type": {"type": "map", "values": "double"}},
        ],
    }
    records = [
        {"a": -1, "b": "x", "m": {"p": 1.5}},
        {"a": 2**40, "b": None, "m": {}},
    ]
    for codec in ("null", "deflate"):
        payload = avro_codec.write_container(records, schema, codec=codec)
        assert payload[:4] == b"Obj\x01"
        got_schema, got = avro_codec.read_container(payload)
        assert got == records and got_schema == schema
        assert avro_codec.read_schema(payload[:4096]) == schema


def test_read_text_corpus_lines_and_whole(spark, tmp_path):
    from icechunk_spark.sources import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("hello world\nsecond line\n")
    (d / "b.txt").write_text("solo doc\n")

    lines = read_text_corpus(spark, str(d))
    got = sorted(r["text"] for r in lines.collect())
    assert got == ["hello world", "second line", "solo doc"]
    assert all(r["path"].endswith(".txt") for r in lines.collect())

    docs = read_text_corpus(spark, str(d), whole_file=True)
    by_file = {r["path"].rsplit("/", 1)[-1]: r["text"] for r in docs.collect()}
    assert by_file["a.txt"] == "hello world\nsecond line\n"
    assert by_file["b.txt"] == "solo doc\n"


def test_read_binary_files_with_glob(spark, tmp_path):
    from icechunk_spark.sources import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "x.img").write_bytes(b"\x00\x01\x02payload")
    (d / "y.img").write_bytes(b"\xff" * 16)
    (d / "skip.txt").write_bytes(b"not media")

    df = read_binary_files(spark, str(d), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"x.img", "y.img"}
    assert bytes(rows["x.img"]["content"]) == b"\x00\x01\x02payload"
    assert rows["y.img"]["length"] == 16


def test_training_shards_roundtrip(spark, tmp_path):
    """write_training_shards: deterministic crc32 shard membership,
    hive shard dirs, gzip parts, and a schema-projected read-back that
    can prune to a shard subset."""
    import zlib

    from icechunk_spark.sources import read_training_shards, write_training_shards

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text", "source")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=8)

    import os

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs and all(d.split("=")[1].isdigit() for d in shard_dirs)
    gz = [
        f
        for d in shard_dirs
        for f in os.listdir(os.path.join(out, d))
        if f.endswith(".json.gz")
    ]
    assert gz, "compressed jsonl parts expected"

    back = read_training_shards(spark, out, "doc_id bigint, text string, source string")
    assert back.count() == df.count()
    # membership is the documented crc32 rule — stable across engines
    row = back.limit(1).collect()[0]
    expected = zlib.crc32(str(row["doc_id"]).encode()) % 8
    one = spark.read.schema("doc_id bigint, text string, source string").json(
        f"{out}/shard={expected}"
    )
    assert one.filter(f"doc_id = {row['doc_id']}").count() == 1


def test_avro_empty_roundtrip(spark, tmp_path):
    """JVM-sink parity in the fallback: writing an EMPTY frame leaves
    a schema-only container file, so reading back yields 0 rows with
    the original schema (not an error)."""
    from pyspark.sql import functions as F

    from icechunk_spark.sources import read_avro, write_avro

    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
    ).filter(F.col("k") < 0)
    p = str(tmp_path / "empty")
    write_avro(df, p)
    back = read_avro(spark, p)
    assert back.schema == df.schema
    assert back.count() == 0
