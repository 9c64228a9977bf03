"""Duplicate-cluster survivorship (SURVEY.md §2c extension): after
near-dup clustering, a pipeline keeps ONE canonical document per
cluster — this operator picks it and reports what the cluster
retires.  Survivor rule (deterministic, the classic "keep the most
complete copy"): longest text, ties to the smallest doc_id.

Scale shape: cluster labels come from dedup_cluster's iterative
min-label propagation (O(edges) per round, diameter-bounded rounds —
dedup.py:356); the survivor pick is one row_number window partitioned
by cluster over the (already corpus-sized) labeled frame, and the
report is one groupBy(cluster).  Nothing new reaches the driver.
Only multi-member clusters are reported — the singleton majority
never leaves the executors.

Oracle: the same recursive-CTE connected components the dedup_cluster
oracle uses, then an identical rank-and-aggregate in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.operators.dedup import _MINHASH_CTES, dedup_cluster


def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = dedup_cluster(spark, sf_dir)
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", F.length("text").alias("len")
    )
    return survivorship_over_labels(labels, docs)


def survivorship_over_labels(labels: DataFrame, docs: DataFrame) -> DataFrame:
    """Survivor pick + retirement census over ANY (doc_id, cluster_id)
    labeling.  Both registered labelers converge to component-minimum
    labels — min-label propagation (dedup_cluster) and large/small-
    star (dedup_cluster_star, the O(log n) web-scale form) — so this
    is labeling-agnostic by construction; tests/test_new_ops_r11.py
    pins that both labelings produce identical survivors (VERDICT r11
    #9), which makes the star variant the drop-in scale path."""
    labeled = labels.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("len"), F.asc("doc_id"))
    ranked = labeled.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("survivor_id"),
            F.min(F.when(F.col("rn") == 1, F.col("len"))).alias("survivor_len"),
            F.sum("len").cast("bigint").alias("total_len"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "cluster_id",
            "survivor_id",
            "n_members",
            "survivor_len",
            (F.col("total_len") - F.col("survivor_len")).alias("chars_retired"),
        )
        .orderBy("cluster_id")
    )


DEDUP_SURVIVORSHIP_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION ALL
  SELECT doc_b, doc_a FROM verified
),
reach AS (
  SELECT doc_id AS doc, doc_id AS lab FROM documents
  UNION
  SELECT r.doc, e.dst FROM reach r JOIN edges e ON r.lab = e.src
),
labels AS (
  SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
  FROM reach GROUP BY doc
),
ranked AS (
  SELECT l.cluster_id, d.doc_id, length(d.text) AS len,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY length(d.text) DESC, d.doc_id ASC) AS rn
  FROM labels l JOIN documents d USING (doc_id)
)
SELECT cluster_id,
       CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_id,
       count(*) AS n_members,
       CAST(min(CASE WHEN rn = 1 THEN len END) AS BIGINT) AS survivor_len,
       CAST(sum(len) - min(CASE WHEN rn = 1 THEN len END) AS BIGINT) AS chars_retired
FROM ranked
GROUP BY cluster_id
HAVING count(*) >= 2
ORDER BY cluster_id
"""

QUERIES = {"dedup_survivorship": dedup_survivorship}
ORACLES = {"dedup_survivorship": DEDUP_SURVIVORSHIP_SQL}
