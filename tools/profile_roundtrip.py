"""Phase-level timing of array_store_roundtrip (guide §1: find where
the 3.1 s actually goes before changing anything).

    python tools/profile_roundtrip.py [sf_dir] [n_trials]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from icechunk_spark.engine import get_spark, local_df
    from icechunk_spark.operators.repo_queries import _daily_revenue, N_DAYS, CHUNK
    from icechunk_spark.repo import Repository

    spark = get_spark("profile-roundtrip")
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench.py
    from icechunk_spark.registry import all_queries

    all_queries()["q6_forecast_revenue"](spark, sf_dir).count()
    warm = spark.range(64).withColumn("g", (F.col("id") % 4).cast("int"))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g int").count()

    for trial in range(n):
        spark.catalog.clearCache()
        root = os.path.join(tempfile.gettempdir(), f"icr_prof_{uuid.uuid4().hex}")
        marks: list[tuple[str, float]] = []

        def mark(label: str) -> None:
            marks.append((label, time.perf_counter()))

        try:
            mark("start")
            repo = Repository.create(spark, root)
            mark("repo.create")
            s = repo.writable_session("main")
            mark("writable_session")
            s.create_array("/revenue", shape=[N_DAYS], chunk_shape=[CHUNK])
            mark("create_array")
            s.write_array_df("/revenue", _daily_revenue(spark, sf_dir))
            mark("write_array_df")
            s.commit("daily revenue v1")
            mark("commit")
            out = (
                repo.readonly_session()
                .read_array_df("/revenue", slices=[(128, 512)])
                .filter(F.col("value") != 0.0)
                .select(F.col("i0").alias("day_idx"), F.col("value").alias("revenue"))
                .orderBy("day_idx")
            )
            mark("read_plan_built")
            rows = out.collect()
            mark("read_collect")
            local_df(spark, rows, "day_idx bigint, revenue double").count()
            mark("materialize")
        finally:
            shutil.rmtree(root, ignore_errors=True)
        total = marks[-1][1] - marks[0][1]
        print(f"--- trial {trial + 1}: total {total:.3f}s")
        prev = marks[0][1]
        for label, t in marks[1:]:
            print(f"  {t - prev:6.3f}  {label}")
            prev = t
    spark.stop()


if __name__ == "__main__":
    main()
