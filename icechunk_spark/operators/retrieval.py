"""Sparse TF-IDF retrieval (SURVEY.md §2e extension): top-k similar
documents for a query set via an INVERTED-INDEX join — the sparse
complement to the dense ANN stack (knn_*/pq): dedup finds
near-copies, embedding kNN finds semantic neighbors, and TF-IDF
retrieval is what "find the training docs most similar to this eval
prompt" contamination forensics actually runs at corpus scale.

Scale shape (classic IR): per-(doc, term) TF-IDF weights from two
map-side-combined aggregates; QUERY vectors pruned to their top
``Q_TERMS`` weights (the WAND-style budget — a query term with
df ~ N joins the whole corpus, and its idf makes its contribution
negligible, so the prune is both the cost and the relevance answer);
candidates come from the posting-list equi-join on term, partial dot
products accumulate in one (query, doc) groupBy, and per-query top-k
uses the two-stage partial rank (similarity._partial_topk).  Nothing
is ever all-pairs: candidate cardinality = sum over query terms of
df(term).

Exactness: weights and every dot/norm term round to DECIMAL before
any sum; scores round 6dp before ranking (round-before-rank); ties
break on match_doc.  Scores are "pruned-query cosine" — both engines
compute the identical pruned semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import tokenize
from icechunk_spark.operators.similarity import _partial_topk

RET_QUERIES = 5  # doc_id < 5 are the query documents
RET_TOPK = 3
Q_TERMS = 8  # query-side term budget


def sparse_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_doc, doc_id, score) pruned-query TF-IDF cosine rows —
    the shared core of sparse_retrieval and the RRF hybrid."""
    docs = load_tables(spark, sf_dir)["documents"]
    tf = (
        docs.select(
            "doc_id", F.explode(tokenize(F.lower(F.col("text")))).alias("t")
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    n_docs = docs.count()
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # DECIMAL(28,14) intermediate before the 10dp round: round(double,
    # 10) near a half-point split the engines by 1e-10 at sf0.001 and
    # the drift surfaced at the score's 6dp boundary (0.508746 vs
    # 0.508747) — the recorded cast-before-round pattern, applied at
    # the SOURCE of the float
    w = tf.join(df_, "t").select(
        "doc_id",
        "t",
        F.round(
            (
                F.col("tf")
                * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
            ).cast("decimal(28,14)"),
            10,
        )
        .cast("decimal(28,10)")
        .alias("w"),
    ).persist()
    # products run in DOUBLES (identical cross-engine, since w's
    # decimals are identical) then per-term decimal-round: a
    # decimal(28,10)^2 product overflows 38 digits and Spark's
    # allowPrecisionLoss silently drops the scale to 6 while DuckDB
    # keeps 20 — measured as a 1e-6 norm split at sf0.001
    wd = F.col("w").cast("double")
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(
                F.round((wd * wd).cast("decimal(28,14)"), 10).cast("decimal(38,10)")
            ).cast("double")
        ).alias("nrm")
    )
    qw_all = w.filter(F.col("doc_id") < RET_QUERIES)
    qrank = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("t").asc())
    qw = (
        qw_all.withColumn("qr", F.row_number().over(qrank))
        .filter(F.col("qr") <= Q_TERMS)
        .select(F.col("doc_id").alias("query_doc"), "t", F.col("w").alias("qw"))
    )
    dots = (
        w.join(qw, "t")
        .filter(F.col("doc_id") != F.col("query_doc"))
        .groupBy("query_doc", "doc_id")
        .agg(
            F.sum(
                F.round(
                    (F.col("qw").cast("double") * F.col("w").cast("double")).cast(
                        "decimal(28,14)"
                    ),
                    10,
                ).cast("decimal(38,10)")
            ).alias("dp")
        )
    )
    # zero-norm guard (the projection.py saa>0 pattern): a doc whose
    # every term has df = N carries all-zero weights and nrm = 0
    scored = (
        dots.join(norms.withColumnRenamed("doc_id", "query_doc").withColumnRenamed("nrm", "qn"), "query_doc")
        .join(norms, "doc_id")
        .filter((F.col("qn") > 0) & (F.col("nrm") > 0))
        .select(
            "query_doc",
            "doc_id",
            F.round(
                (F.col("dp").cast("double") / (F.col("qn") * F.col("nrm"))).cast(
                    "decimal(24,10)"
                ),
                6,
            )
            .cast("double")
            .alias("score"),
        )
    )
    return scored


def sparse_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = sparse_scores(spark, sf_dir)
    return (
        _partial_topk(
            scored,
            ["query_doc"],
            [F.desc("score"), F.asc("doc_id")],
            RET_TOPK,
        )
        .select("query_doc", "rnk", F.col("doc_id").alias("match_doc"), "score")
        .orderBy("query_doc", "rnk")
    )


# the WITH-body through `scored` — shared with the RRF hybrid oracle
SPARSE_CORE_SQL = f"""WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t
  FROM documents
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2
), dfr AS (
  SELECT t, count(*) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT count(*) AS n FROM documents
), w AS (
  SELECT doc_id, tf.t,
         CAST(round(CAST(tf * ln((CAST(n AS DOUBLE) + 1.0) / (df + 1.0))
                         AS DECIMAL(28,14)), 10)
              AS DECIMAL(28,10)) AS w
  FROM tf JOIN dfr ON tf.t = dfr.t, nd
), norms AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(round(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                                       AS DECIMAL(28,14)), 10)
                            AS DECIMAL(38,10))) AS DOUBLE)) AS nrm
  FROM w GROUP BY 1
), qw AS (
  SELECT doc_id AS query_doc, t, w AS qw
  FROM (SELECT doc_id, t, w,
               row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, t) AS qr
        FROM w WHERE doc_id < {RET_QUERIES})
  WHERE qr <= {Q_TERMS}
), dots AS (
  SELECT query_doc, w.doc_id,
         sum(CAST(round(CAST(CAST(qw AS DOUBLE) * CAST(w AS DOUBLE)
                             AS DECIMAL(28,14)), 10)
                  AS DECIMAL(38,10))) AS dp
  FROM w JOIN qw ON w.t = qw.t AND w.doc_id <> qw.query_doc
  GROUP BY 1, 2
), scored AS (
  SELECT query_doc, dots.doc_id,
         CAST(round(CAST(CAST(dp AS DOUBLE) / (qn.nrm * dn.nrm) AS DECIMAL(24,10)), 6)
              AS DOUBLE) AS score
  FROM dots
  JOIN norms qn ON qn.doc_id = dots.query_doc
  JOIN norms dn ON dn.doc_id = dots.doc_id
  WHERE qn.nrm > 0 AND dn.nrm > 0
)"""

SPARSE_RETRIEVAL_SQL = SPARSE_CORE_SQL + f"""
, ranked AS (
  SELECT query_doc, doc_id, score,
         row_number() OVER (PARTITION BY query_doc
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_doc, CAST(rnk AS BIGINT) AS rnk, doc_id AS match_doc, score
FROM ranked WHERE rnk <= {RET_TOPK}
ORDER BY query_doc, rnk
"""


QUERIES = {
    "sparse_retrieval": sparse_retrieval,
}

ORACLES = {
    "sparse_retrieval": SPARSE_RETRIEVAL_SQL,
}
