from __future__ import annotations

from pyspark.sql import functions as F

from icechunk_spark.repo import Repository
from icechunk_spark.streaming.events import read_event_stream, stream_append_to_repo

from .conftest import SF_DIR


def test_stream_append_to_repo(spark, tmp_path):
    repo = Repository.create(spark, str(tmp_path / "repo"))
    with repo.transaction(message="init") as s:
        s.create_array("/user_counts", shape=[1024], chunk_shape=[64])
    ev = read_event_stream(spark, SF_DIR)
    stream_append_to_repo(spark, ev, repo, "/user_counts", str(tmp_path / "ckpt"))
    # one commit per micro-batch, tagged with its batch id
    history = list(repo.ancestry(branch="main"))
    batch_commits = [s for s in history if "stream_batch_id" in (s.metadata or {})]
    assert batch_commits, "no stream commits landed"
    # final counts equal the batch ground truth
    got = {
        r["i0"]: r["value"]
        for r in repo.readonly_session().read_array_df("/user_counts").collect()
        if r["value"] != 0.0
    }
    truth = {
        r["user_id"]: float(r["n"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == truth


def test_stream_source_accepts_parquet_directory(spark, tmp_path):
    """A parquet DIRECTORY source streams in place — no staging, no
    symlink (the staging path is only for bare single-file sources,
    and is a real copy that works on object-store roots)."""
    import os

    from icechunk_spark.streaming.events import _stream_dir, run_to_memory

    src_dir = str(tmp_path / "sf")
    os.makedirs(src_dir)
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(100).write.parquet(
        f"{src_dir}/events.parquet"
    )
    # directory source: used as-is
    assert _stream_dir(src_dir) == f"{src_dir}/events.parquet"
    ev = read_event_stream(spark, src_dir)
    run_to_memory(ev.select("event_id"), "dirsrc")
    assert spark.sql("select count(*) n from dirsrc").collect()[0]["n"] == 100


def test_stream_source_stages_single_file_via_copy(spark):
    """A bare single-file source is staged with a real byte copy (no
    os.symlink), so the same path works where symlinks don't."""
    import os

    from icechunk_spark.streaming.events import _stream_dir

    d = _stream_dir(SF_DIR)
    staged = os.path.join(d, "events.parquet")
    assert os.path.isfile(staged) and not os.path.islink(staged)
    assert os.path.getsize(staged) == os.path.getsize(f"{SF_DIR}/events.parquet")


def test_repo_changes_stream(spark, tmp_path):
    """CDC read-side: the txlog plane IS a file stream — each commit
    appears as change records with its snapshot id; a later drain picks
    up only the delta (file-source checkpointing)."""
    from icechunk_spark.repo import Repository
    from icechunk_spark.streaming.repo_cdc import repo_changes_stream

    root = str(tmp_path / "repo")
    repo = Repository.create(spark, root)
    with repo.transaction(message="c0") as s:
        s.create_array("/a", shape=[8], chunk_shape=[4])
        s.set_chunk_bytes("/a", "0", b"x" * 4096)
    first = repo.lookup_branch("main")

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            repo_changes_stream(spark, root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    rows = spark.read.parquet(out).collect()
    assert {r["snapshot_id"] for r in rows} == {first}
    ops = {r["op"] for r in rows}
    assert "node_create" in ops and "set" in ops
    node_id = repo.readonly_session().array_meta("/a").node_id
    assert any(r["node_id"] == node_id and r["chunk_key"] == "0" for r in rows)

    # two more commits; the SAME checkpoint drains only the delta
    with repo.transaction(message="c1") as s:
        s.set_chunk_bytes("/a", "1", b"y" * 4096)
    with repo.transaction(message="c2") as s:
        s.delete_chunk("/a", "0")
    chain = list(repo.ancestry(branch="main"))
    third, second = chain[0].id, chain[1].id
    drain()
    new = [r for r in spark.read.parquet(out).collect() if r["snapshot_id"] != first]
    assert {r["snapshot_id"] for r in new} == {second, third}
    assert any(r["op"] == "del" for r in new)


def test_zscore_alerts_state_carries_across_batches(spark, tmp_path):
    """stream_zscore_alerts with the events split into THREE
    time-ordered files and maxFilesPerTrigger=1 (three micro-batches):
    the per-user deque state must carry across batches, so the drained
    census equals the single-batch (and batch-operator) result."""
    import uuid

    from pyspark.sql.window import Window

    from icechunk_spark.operators.anomaly_ext import rolling_zscore_anomalies
    from icechunk_spark.streaming.events import run_to_memory, zscore_alerts_stream

    # stage time-ordered thirds (global ts order; in-stream arrival
    # order then matches event time, the contract the op documents)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = src.count()
    ordered = src.orderBy("ts", "event_id").withColumn(
        "__rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    d = tmp_path / "ev_split"
    for i in range(3):
        (
            ordered.filter(
                (F.col("__rn") > i * n / 3) & (F.col("__rn") <= (i + 1) * n / 3)
            )
            .drop("__rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(d))
        )
    raw = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    name = f"zal_t_{uuid.uuid4().hex[:8]}"
    run_to_memory(zscore_alerts_stream(raw), name, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_scored"))
    drained = (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("n_scored") > 0))
        .select("user_id", "n_scored", "n_anomalies", "max_abs_z")
        .orderBy("user_id")
        .collect()
    )
    batch = rolling_zscore_anomalies(spark, SF_DIR).collect()
    assert [tuple(r) for r in drained] == [tuple(r) for r in batch]


def test_zscore_state_survives_restart_under_rocksdb(spark, tmp_path):
    """VERDICT r9 #8: per-user state must survive a query RESTART from
    checkpoint, under the RocksDB state store (the provider a 10^9-user
    deployment needs — engine.use_rocksdb_state_store).  Protocol: two
    time-ordered halves; run 1 drains half 1 and stops; half 2 lands;
    run 2 restarts from the same checkpoint and processes ONLY the new
    file.  If state restored, the stitched census equals the batch
    oracle over the whole table; a state loss resets every user's
    trailing window mid-stream and the counts diverge."""
    import uuid

    from pyspark.sql import Window

    from icechunk_spark.engine import use_rocksdb_state_store
    from icechunk_spark.operators.anomaly_ext import rolling_zscore_anomalies
    from icechunk_spark.streaming.events import zscore_alerts_stream

    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = src.count()
    ordered = src.orderBy("ts", "event_id").withColumn(
        "__rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    d = tmp_path / "ev_restart"
    ckpt = tmp_path / "ckpt"
    halves = []
    for i in range(2):
        half = tmp_path / f"half{i}"
        (
            ordered.filter(
                (F.col("__rn") > i * n / 2) & (F.col("__rn") <= (i + 1) * n / 2)
            )
            .drop("__rn")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(half))
        )
        halves.append(half)
    d.mkdir()
    schema = spark.read.parquet(str(halves[0])).schema
    collected: list = []

    def run_drain() -> None:
        raw = (
            spark.readStream.schema(schema)
            .parquet(str(d))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        q = (
            zscore_alerts_stream(raw)
            .writeStream.foreachBatch(
                lambda batch_df, _bid: collected.extend(batch_df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def land(half, tag):
        for f in half.glob("*.parquet"):
            (d / f"{tag}_{f.name}").write_bytes(f.read_bytes())

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    prev = use_rocksdb_state_store(spark)
    try:
        land(halves[0], "a")
        run_drain()  # run 1: half 1 only, then the query STOPS
        assert collected, "first drain produced no state rows"
        land(halves[1], "b")
        run_drain()  # run 2: restart from checkpoint, new file only
    finally:
        key = "spark.sql.streaming.stateStore.providerClass"
        spark.conf.set(key, prev) if prev else spark.conf.unset(key)

    # the checkpoint's state dir must carry RocksDB artifacts, not the
    # HDFS provider's .delta/.snapshot files
    state_files = [str(p) for p in (ckpt / "state").rglob("*") if p.is_file()]
    assert any(".zip" in f or "rocksdb" in f.lower() for f in state_files), state_files
    assert not any(f.endswith(".delta") for f in state_files), state_files

    latest: dict = {}
    for r in collected:  # update-mode: later rows supersede (n_scored monotone)
        if r.n_scored > 0 and (
            r.user_id not in latest or r.n_scored >= latest[r.user_id].n_scored
        ):
            latest[r.user_id] = r
    stitched = sorted(
        (r.user_id, r.n_scored, r.n_anomalies, r.max_abs_z) for r in latest.values()
    )
    batch = sorted(tuple(r) for r in rolling_zscore_anomalies(spark, SF_DIR).collect())
    assert stitched == batch
