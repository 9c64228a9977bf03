"""Component probe for dedup_cluster's dispatch decision: time ONLY
what the subgraph rewrite changes — the min-label propagation rounds
plus (for the subgraph path) the final singleton attach — over the
REAL pair graph of a documents replica, replicated R times with id
offsets (replicas are disjoint components, exactly how the corpus
scale-up behaves: linear docs, linear pairs, same dup rate).

The whole-operator A/B (tools/ab_dedup_cluster.py) is dominated by
the minhash pipeline (~20 s at 500k docs), which the change does not
touch; this probe attributes the delta to the component that changed
(guide §1.1).

    python tools/ab_cluster_rounds.py <pairs_parquet> <n_docs_base> <replicate> [n_trials]

<pairs_parquet>: minhash_lsh pairs of the base replica, written once:
    df = minhash_lsh(spark, sf_dir).select("doc_a","doc_b")
    df.write.parquet(path)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

D_STRIDE = 1_000_000_000  # id offset per replica (clear of real ids)


def main() -> None:
    pairs_path = sys.argv[1]
    n_docs_base = int(sys.argv[2])
    replicate = int(sys.argv[3])
    n_trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from icechunk_spark.engine import get_spark
    from icechunk_spark.operators.dedup import _min_label_propagate

    spark = get_spark("ab-cluster-rounds")
    spark.sparkContext.setLogLevel("ERROR")

    base_pairs = spark.read.parquet(pairs_path)
    n_base_pairs = base_pairs.count()
    print(
        f"base: {n_docs_base} docs, {n_base_pairs} pairs; x{replicate} -> "
        f"{n_docs_base * replicate} docs, {n_base_pairs * replicate} pairs",
        file=sys.stderr,
    )

    def scaled_edges():
        reps = spark.range(replicate).select(
            (F.col("id") * D_STRIDE).alias("__off")
        )
        p = base_pairs.crossJoin(reps).select(
            (F.col("doc_a") + F.col("__off")).alias("doc_a"),
            (F.col("doc_b") + F.col("__off")).alias("doc_b"),
        )
        return (
            p.select(
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

    def docs_universe():
        # (replica, base_id) -> replica*STRIDE + base_id; same ids the
        # offset pair graph references
        return (
            spark.range(n_docs_base * replicate)
            .select(
                (
                    (F.col("id") % replicate) * D_STRIDE + (F.col("id") / replicate).cast("long")
                ).alias("doc_id")
            )
        )

    def run_alldocs(edges):
        seed = docs_universe().select(
            F.col("doc_id"), F.col("doc_id").alias("cluster_id")
        ).persist()
        labels = _min_label_propagate(edges, seed)
        return labels.select("doc_id", "cluster_id")

    def run_subgraph(edges):
        seed = edges.select(F.col("src").alias("doc_id"), F.col("src").alias("cluster_id"))
        labels = _min_label_propagate(edges, seed)
        return (
            docs_universe()
            .join(labels, "doc_id", "left")
            .select(
                "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
            )
        )

    res = {"A_alldocs": [], "B_subgraph": []}
    for t in range(n_trials):
        for key, fn in (("A_alldocs", run_alldocs), ("B_subgraph", run_subgraph)):
            spark.catalog.clearCache()
            edges = scaled_edges()
            edges.count()  # materialize the persisted edge set OUTSIDE the timer
            t0 = time.perf_counter()
            fn(edges).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            edges.unpersist()
            res[key].append(round(dt, 3))
            print(f"trial {t + 1}: {key} {dt:.3f}s", file=sys.stderr)
    for k, v in res.items():
        print(f"{k}: min={min(v)} runs={v}")
    spark.stop()


if __name__ == "__main__":
    main()
