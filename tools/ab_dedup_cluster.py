"""Interleaved A/B: dedup_cluster current (labels over ALL docs per
round) vs edge-subgraph variant (labels over nodes that appear in the
LSH pair graph only; singletons attached once at the end).

Also reports the round count and per-phase timings so the change is
attributed, and pins value equality between the variants first.

    python tools/ab_dedup_cluster.py [sf_dir] [n_trials]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-subgraph min-label propagation; identical labels."""
    from icechunk_spark.catalog import load_tables
    from icechunk_spark.operators.dedup import minhash_lsh

    pairs = minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.*")
        .persist()
    )
    labels = edges.select(
        F.col("src").alias("doc_id"), F.col("src").alias("cluster_id")
    )  # duplicates fine: round-1 groupBy dedups; min unaffected
    cached = labels
    rounds = 0
    for _ in range(64):
        rounds += 1
        prop = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), F.col("cluster_id"), F.lit(False).alias("own")
        )
        agg = (
            labels.withColumn("own", F.lit(True))
            .unionByName(prop)
            .groupBy("doc_id")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                F.min(F.when(F.col("own"), F.col("cluster_id"))).alias("old_label"),
            )
            .persist()
        )
        changed = agg.filter(F.col("cluster_id") != F.col("old_label")).count()
        cached.unpersist()
        cached = agg
        labels = agg.select("doc_id", "cluster_id")
        if changed == 0:
            break
    edges.unpersist()
    t = load_tables(spark, sf_dir)
    print(f"  [B] rounds={rounds}", file=sys.stderr)
    return (
        t["documents"]
        .select("doc_id")
        .join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from icechunk_spark.engine import get_spark
    from icechunk_spark.operators.dedup import dedup_cluster

    spark = get_spark("ab-dedup-cluster")
    spark.sparkContext.setLogLevel("ERROR")

    # equality pin first
    a = dedup_cluster(spark, sf_dir).collect()
    spark.catalog.clearCache()
    b = variant_b(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "variants disagree!"
    print(f"equality pin OK ({len(a)} rows)", file=sys.stderr)

    res = {"A_current": [], "B_subgraph": []}
    for t in range(n):
        for key, fn in (
            ("A_current", lambda: dedup_cluster(spark, sf_dir)),
            ("B_subgraph", lambda: variant_b(spark, sf_dir)),
        ):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            res[key].append(round(dt, 3))
            print(f"trial {t + 1}: {key} {dt:.3f}s", file=sys.stderr)
    for k, v in res.items():
        print(f"{k}: min={min(v)} runs={v}")
    spark.stop()


if __name__ == "__main__":
    main()
