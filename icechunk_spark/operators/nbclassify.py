"""Distributed hashed-feature Naive Bayes source classifier
(SURVEY.md §2e extension): the "train a domain/quality classifier on
the corpus itself" step of LLM curation pipelines (CCNet's fastText
LM-domain filter, GPT-3's WebText-vs-CommonCrawl quality classifier)
re-expressed as pure aggregations.

Train: multinomial NB over unigram tokens hashed into ``NB_B``
buckets (the hashing trick — the model is AT MOST L x NB_B rows no
matter the corpus size, which is what keeps it broadcastable at
100 TB).  The train/test split is md5-HASH-based (md5(doc_id) % 5),
not modulo-based: the testdata assigns source = f(doc_id % 20), so a
plain ``doc_id % 5`` split puts every test label outside the training
set — a split correlated with the label is the classic leakage bug in
reverse, and the hash split is what a production pipeline does anyway.
Laplace-smoothed per-label bucket log-probabilities; unseen buckets
take the label's smoothed default, handled EXACTLY via the
decomposition score = prior + total_cnt*default + sum(cnt*(lp -
default)) over seen (label, bucket) pairs — no dense L x B frame is
ever materialized.

Scale shape: one tokenize+hash scan, ONE (doc_id, bucket) groupBy
(map-side combine) persisted for both sides, a fixed-size model
broadcast back, a per-doc argmax window (parallelism = #docs), and an
L x L confusion aggregate.  Exactness: every log term is rounded to
8dp (cross-engine HALF_UP via the decimal cast — the dsir pattern)
then held as an exact 1e-8-units BIGINT, so all score sums and the
argmax run in plain integer arithmetic — bit-identical under any
partitioning and across engines, and ~2x faster than the decimal
path at sf10; the output itself is pure BIGINT counts.

Note on the testdata: the synthetic corpus draws every source from
one shared ~31-word vocabulary with near-uniform frequencies, so
chance-level accuracy here is the DATA's ceiling (a pure-Python NB
with no hashing also scores ~chance).  The "learns when signal
exists" property is pinned by tests/test_nbclassify.py on a
planted-signal corpus (disjoint vocabularies -> 100% accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import ensure_min_partitions_files, tokenize

NB_B = 4096  # feature buckets (hashing trick)
NB_TEST_MOD = 5  # md5(doc_id) % 5 == 0 -> test split


def _bucket(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % NB_B


def _is_test(doc_id_col):
    return (
        F.conv(F.substring(F.md5(doc_id_col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % NB_TEST_MOD
        == 0
    )


def _re8(col):
    """Log term as an exact 1e-8-units BIGINT: the 8dp decimal round
    (cross-engine HALF_UP) scaled to an integer, so every score sum,
    comparison, and argmax below runs in plain BIGINT arithmetic —
    measured ~2x faster than the decimal path at sf10, bit-identical
    by construction."""
    return (F.round(col, 8).cast("decimal(28,8)") * 100000000).cast("bigint")


def nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    # spread the byte-small documents scan (1-2 splits) so the
    # CPU-heavy tokenize+md5-bucket explode runs on every core (no-op
    # at real scale — the minhash/lsh_quality pattern); the prior
    # branch keeps the raw scan (a trivial count by source)
    toks = ensure_min_partitions_files(
        docs.select("doc_id", "source", "text"),
        table_parquet_files(sf_dir, "documents"),
    ).select(
        "doc_id",
        "source",
        F.explode(tokenize(F.lower(F.col("text")))).alias("tok"),
    )
    # ONE doc-level aggregate feeds both the model build and scoring
    dbc = (
        toks.select("doc_id", "source", _bucket(F.col("tok")).alias("b"))
        .groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    train = dbc.filter(~_is_test(F.col("doc_id")))
    test = dbc.filter(_is_test(F.col("doc_id")))

    lbc = train.groupBy(F.col("source").alias("label"), "b").agg(
        F.sum("n").alias("cnt")
    )
    # per-label token mass + train-doc priors (docs table, not dbc:
    # a zero-token train doc still counts toward its label's prior)
    lstat = lbc.groupBy("label").agg(F.sum("cnt").alias("tot"))
    prior = (
        docs.filter(~_is_test(F.col("doc_id")))
        .groupBy(F.col("source").alias("label"))
        .agg(F.count(F.lit(1)).alias("ndocs"))
    )
    ntrain = prior.agg(F.sum("ndocs").alias("nall"))
    labels = (
        prior.join(lstat, "label", "left")
        .crossJoin(F.broadcast(ntrain))
        .select(
            "label",
            _re8(F.log(F.col("ndocs") / F.col("nall"))).alias("rprior"),
            _re8(
                F.log(F.lit(1.0) / (F.coalesce(F.col("tot"), F.lit(0)) + NB_B))
            ).alias("rdflt"),
            F.coalesce(F.col("tot"), F.lit(0)).alias("tot"),
        )
    )
    model = lbc.join(labels.select("label", "tot", "rdflt"), "label").select(
        "label",
        "b",
        (
            _re8(F.log((F.col("cnt") + F.lit(1.0)) / (F.col("tot") + NB_B)))
            - F.col("rdflt")
        ).alias("radj"),
    )

    tdoc = test.groupBy("doc_id", F.col("source").alias("actual")).agg(
        F.sum("n").alias("total_cnt")
    )
    base = tdoc.crossJoin(
        F.broadcast(labels.select("label", "rprior", "rdflt"))
    ).select(
        "doc_id",
        "actual",
        "label",
        (F.col("rprior") + F.col("total_cnt") * F.col("rdflt")).alias("base"),
    )
    adj = (
        test.join(F.broadcast(model), "b")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("n") * F.col("radj")).alias("adj"))
    )
    scored = base.join(adj, ["doc_id", "label"], "left").select(
        "doc_id",
        "actual",
        "label",
        (F.col("base") + F.coalesce(F.col("adj"), F.lit(0))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    pred = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    out = (
        pred.groupBy(
            F.col("actual").alias("actual_source"),
            F.col("label").alias("predicted_source"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("actual_source", "predicted_source")
    )
    return out


from icechunk_spark.oracle_util import duck_hex2int as _hex2int


def _nb_sql() -> str:
    hex2int = _hex2int("hh")
    split2int = _hex2int("dh")
    return f"""
WITH docsplit AS (
  SELECT doc_id, source, text,
         ({split2int}) % {NB_TEST_MOD} = 0 AS is_test
  FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS dh FROM documents)
), toks AS (
  SELECT doc_id, source, is_test,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok
  FROM docsplit
), feat AS (
  SELECT doc_id, source, is_test, substr(md5(tok), 1, 8) AS hh FROM toks
), dbc AS (
  SELECT doc_id, source, is_test, ({hex2int}) % {NB_B} AS b, count(*) AS n
  FROM feat GROUP BY 1, 2, 3, 4
), lbc AS (
  SELECT source AS label, b, sum(n) AS cnt
  FROM dbc WHERE NOT is_test GROUP BY 1, 2
), lstat AS (
  SELECT label, sum(cnt) AS tot FROM lbc GROUP BY 1
), prior AS (
  SELECT source AS label, count(*) AS ndocs
  FROM docsplit WHERE NOT is_test GROUP BY 1
), ntrain AS (
  SELECT sum(ndocs) AS nall FROM prior
), labels AS (
  SELECT label,
         CAST(CAST(round(ln(CAST(ndocs AS DOUBLE) / nall), 8) AS DECIMAL(28,8))
              * 100000000 AS BIGINT) AS rprior,
         CAST(CAST(round(ln(1.0 / (COALESCE(tot, 0) + {NB_B})), 8) AS DECIMAL(28,8))
              * 100000000 AS BIGINT) AS rdflt,
         COALESCE(tot, 0) AS tot
  FROM prior LEFT JOIN lstat USING (label), ntrain
), model AS (
  SELECT lbc.label, b,
         CAST(CAST(round(ln((cnt + 1.0) / (labels.tot + {NB_B})), 8) AS DECIMAL(28,8))
              * 100000000 AS BIGINT)
           - labels.rdflt AS radj
  FROM lbc JOIN labels ON lbc.label = labels.label
), tdoc AS (
  SELECT doc_id, source AS actual, sum(n) AS total_cnt
  FROM dbc WHERE is_test GROUP BY 1, 2
), base AS (
  SELECT doc_id, actual, label,
         rprior + total_cnt * rdflt AS base
  FROM tdoc, labels
), adj AS (
  SELECT doc_id, model.label, sum(n * radj) AS adj
  FROM dbc JOIN model USING (b)
  WHERE is_test
  GROUP BY 1, 2
), scored AS (
  SELECT base.doc_id, actual, base.label,
         base + COALESCE(adj, 0) AS score
  FROM base LEFT JOIN adj ON base.doc_id = adj.doc_id AND base.label = adj.label
), pred AS (
  SELECT doc_id, actual, label,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rk
  FROM scored
)
SELECT actual AS actual_source, label AS predicted_source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY 1, 2
ORDER BY 1, 2
"""


NB_SOURCE_CLASSIFIER_SQL = _nb_sql()


QUERIES = {
    "nb_source_classifier": nb_source_classifier,
}

ORACLES = {
    "nb_source_classifier": NB_SOURCE_CLASSIFIER_SQL,
}
