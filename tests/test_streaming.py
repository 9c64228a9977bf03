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
