"""Hard-negative mining for contrastive embedding training
(SURVEY.md §2d extension): for each query vector, the top-K
most-similar vectors with a DIFFERENT label — the classic miner that
feeds triplet/InfoNCE training with "hard" negatives (visually/
semantically close, semantically wrong).  Random negatives are easy
and carry no gradient signal; the miner's job is exactly this
wrong-label top-k.

Scale shape: identical to knn_brute_force (similarity.py:69) — norms
computed once per row BEFORE the pair stage, broadcast of the bounded
query set, statically unrolled dot product inside whole-stage codegen,
partial per-partition top-k so only K rows per query survive the
shuffle.  The 100 TB path swaps the brute-force pair stage for the
LSH/IVF candidate generation (knn_lsh / knn_ivf) with the label
filter applied to candidates; the miner's selection semantics —
wrong-label, cos DESC, id ASC — stay the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, l2_norm
from icechunk_spark.operators.similarity import (
    _D_DOT,
    _D_NORM_A,
    _D_NORM_B,
    N_QUERIES,
    TOP_K,
    _partial_topk,
    dot,
)


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["embeddings"],
        table_parquet_files(sf_dir, "embeddings"),
    ).withColumn(
        "nb", l2_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
        F.col("nb").alias("nq"),
    )
    pairs = emb.join(broadcast(q), F.col("label") != F.col("q_label"))
    pairs = pairs.withColumn(
        "cos_sim",
        F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb")), 4),
    )
    return (
        _partial_topk(pairs, ["query_id"], [F.desc("cos_sim"), F.asc("vec_id")], TOP_K)
        .select(
            "query_id",
            "q_label",
            "rnk",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("neg_label"),
            "cos_sim",
        )
        .orderBy("query_id", "rnk")
    )


HARD_NEGATIVE_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS query_id, a.label AS q_label,
         b.vec_id AS negative_id, b.label AS neg_label,
         round({_D_DOT} / ({_D_NORM_A} * {_D_NORM_B}), 4) AS cos_sim
  FROM embeddings a JOIN embeddings b ON b.label <> a.label
  WHERE a.vec_id < {N_QUERIES}
), ranked AS (
  SELECT query_id, q_label, negative_id, neg_label, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, negative_id ASC) AS rnk
  FROM pairs
)
SELECT query_id, q_label, rnk, negative_id, neg_label, cos_sim
FROM ranked WHERE rnk <= {TOP_K}
ORDER BY query_id, rnk
"""

QUERIES = {"hard_negative_mining": hard_negative_mining}
ORACLES = {"hard_negative_mining": HARD_NEGATIVE_SQL}
