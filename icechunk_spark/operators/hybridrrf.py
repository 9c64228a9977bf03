"""Hybrid retrieval via Reciprocal Rank Fusion (SURVEY.md §2d/§2e
capstone): fuse the SPARSE TF-IDF candidate list (retrieval.py) with
the DENSE embedding-cosine list per query document — the
two-retriever architecture modern search/contamination systems run,
with RRF (Cormack et al. 2009) as the fusion rule because it is
RANK-based: no score normalization across incommensurable scales, and
a document present in only one list still fuses (at sf0.1 only a
subset of documents carries embeddings — exactly the partial-coverage
case rank fusion exists for).

rrf(d) = sum over lists of 1/(K_RRF + rank_d); ranks are exact
integers from 6dp-rounded scores (round-before-rank), the two-term
sum is a fixed-order double over exact small integers (identical
cross-engine; its rational value can never land on an 8dp half-point
— the denominator's primes don't divide 10^8), ties break on
match_doc.

Scale shape: both candidate generators are the proven sub-quadratic
shapes (posting-list join; broadcast query set x one embeddings
pass), each pruned to HY_POOL per query by the two-stage partial
rank; the fusion itself is a full-outer join of two (query, doc,
rank) lists of HY_POOL rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import l2_norm
from icechunk_spark.operators.retrieval import (
    RET_QUERIES,
    RET_TOPK,
    SPARSE_CORE_SQL,
    sparse_scores,
)
from icechunk_spark.operators.similarity import _partial_topk

HY_POOL = 20  # per-list candidate budget
K_RRF = 60  # the standard RRF constant


def _dense_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icechunk_spark.functions import ensure_min_partitions_files

    # spread the scan before the broadcast-joined pair-dot stage: the
    # byte-small parquet arrives as 1-2 splits and a broadcast join
    # keeps the stream side's partitioning, so the n_docs x n_queries
    # dot folds otherwise run nearly single-task (r14)
    emb = ensure_min_partitions_files(
        load_tables(spark, sf_dir)["embeddings"],
        table_parquet_files(sf_dir, "embeddings"),
    ).withColumn(
        "nb", l2_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < RET_QUERIES).select(
        F.col("vec_id").alias("query_doc"),
        F.col("embedding").alias("qe"),
        F.col("nb").alias("nq"),
    )
    from icechunk_spark.functions import dot

    return (
        emb.join(broadcast(q), F.col("vec_id") != F.col("query_doc"))
        .filter((F.col("nq") > 0) & (F.col("nb") > 0))
        .select(
            "query_doc",
            F.col("vec_id").alias("doc_id"),
            F.round(
                (dot(F.col("qe"), F.col("embedding")) / (F.col("nq") * F.col("nb"))).cast(
                    "decimal(24,10)"
                ),
                6,
            )
            .cast("double")
            .alias("score"),
        )
    )


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _partial_topk(
        sparse_scores(spark, sf_dir),
        ["query_doc"],
        [F.desc("score"), F.asc("doc_id")],
        HY_POOL,
    ).select("query_doc", "doc_id", F.col("rnk").alias("sr"))
    dn = _partial_topk(
        _dense_scores(spark, sf_dir),
        ["query_doc"],
        [F.desc("score"), F.asc("doc_id")],
        HY_POOL,
    ).select(
        F.col("query_doc").alias("dq"),
        F.col("doc_id").alias("dd"),
        F.col("rnk").alias("dr"),
    )
    fused = sp.join(
        dn,
        (F.col("query_doc") == F.col("dq")) & (F.col("doc_id") == F.col("dd")),
        "full_outer",
    ).select(
        F.coalesce("query_doc", "dq").alias("query_doc"),
        F.coalesce("doc_id", "dd").alias("match_doc"),
        (
            F.coalesce(F.lit(1.0) / (F.col("sr") + K_RRF), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.col("dr") + K_RRF), F.lit(0.0))
        ).alias("rrf_raw"),
        F.col("sr").isNotNull().alias("in_sparse"),
        F.col("dr").isNotNull().alias("in_dense"),
    )
    fused = fused.withColumn(
        "rrf_score",
        F.round(F.col("rrf_raw").cast("decimal(24,12)"), 8).cast("double"),
    )
    return (
        _partial_topk(
            fused,
            ["query_doc"],
            [F.desc("rrf_score"), F.asc("match_doc")],
            RET_TOPK,
        )
        .select("query_doc", "rnk", "match_doc", "rrf_score", "in_sparse", "in_dense")
        .orderBy("query_doc", "rnk")
    )


def _hy_sql() -> str:
    from icechunk_spark.operators.similarity import DIM

    dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"[CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) FOR i IN range(1, {DIM + 1})]), "
        "(x, y) -> x + y)"
    )
    na = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"[CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE) FOR i IN range(1, {DIM + 1})]), "
        "(x, y) -> x + y))"
    )
    nb = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"[CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) FOR i IN range(1, {DIM + 1})]), "
        "(x, y) -> x + y))"
    )
    return (
        SPARSE_CORE_SQL
        + f"""
, sranked AS (
  SELECT query_doc, doc_id,
         row_number() OVER (PARTITION BY query_doc
                            ORDER BY score DESC, doc_id ASC) AS sr
  FROM scored
), sp AS (
  SELECT query_doc, doc_id, sr FROM sranked WHERE sr <= {HY_POOL}
), dpairs AS (
  SELECT a.vec_id AS query_doc, b.vec_id AS doc_id,
         CAST(round(CAST({dot} / ({na} * {nb}) AS DECIMAL(24,10)), 6) AS DOUBLE) AS score
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {RET_QUERIES} AND {na} > 0 AND {nb} > 0
), dranked AS (
  SELECT query_doc, doc_id,
         row_number() OVER (PARTITION BY query_doc
                            ORDER BY score DESC, doc_id ASC) AS dr
  FROM dpairs
), dn AS (
  SELECT query_doc, doc_id, dr FROM dranked WHERE dr <= {HY_POOL}
), fused AS (
  SELECT COALESCE(sp.query_doc, dn.query_doc) AS query_doc,
         COALESCE(sp.doc_id, dn.doc_id) AS match_doc,
         CAST(round(CAST(COALESCE(1.0 / (sr + {K_RRF}), 0.0)
                         + COALESCE(1.0 / (dr + {K_RRF}), 0.0) AS DECIMAL(24,12)), 8)
              AS DOUBLE) AS rrf_score,
         sr IS NOT NULL AS in_sparse,
         dr IS NOT NULL AS in_dense
  FROM sp FULL OUTER JOIN dn
    ON sp.query_doc = dn.query_doc AND sp.doc_id = dn.doc_id
), rrf_ranked AS (
  SELECT query_doc, match_doc, rrf_score, in_sparse, in_dense,
         row_number() OVER (PARTITION BY query_doc
                            ORDER BY rrf_score DESC, match_doc ASC) AS rnk
  FROM fused
)
SELECT query_doc, CAST(rnk AS BIGINT) AS rnk, match_doc, rrf_score, in_sparse, in_dense
FROM rrf_ranked WHERE rnk <= {RET_TOPK}
ORDER BY query_doc, rnk
"""
    )


HYBRID_RRF_SQL = _hy_sql()


QUERIES = {
    "hybrid_retrieval_rrf": hybrid_retrieval_rrf,
}

ORACLES = {
    "hybrid_retrieval_rrf": HYBRID_RRF_SQL,
}
