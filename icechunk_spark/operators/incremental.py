"""Incremental (new-batch vs historical-index) dedup — the production
ingest shape (SURVEY.md §2c extension): a nightly increment is deduped
against the EXISTING corpus without recomputing existing×existing
pairs.  At 100 TB this is the property that matters: the per-night
cost is O(increment + index probe), not O(corpus²), because candidate
generation only ever joins new-side shingles against the (in
production: precomputed, bucketed) existing-side index.

Split: ``doc_id % 10 < 7`` plays the existing corpus, the rest the
new batch (deterministic, SQL-mirrorable).  Two tiers, exact > near:
- exact: normalized-content md5 already present in the index →
  duplicate_of = smallest existing doc_id with that hash.
- near: 3-token-shingle Jaccard ≥ 0.5 against an existing doc over
  the df-capped universe (the hot-shingle cap from ngram_jaccard —
  a df=d shingle emits O(d·increment) probe pairs).  The threshold
  test is INTEGER-exact: c/(sa+sb−c) ≥ 0.5 ⟺ 3c ≥ sa+sb — no float
  ever enters the predicate, so the engines cannot disagree at the
  boundary.
Kept docs report NULL kind/duplicate_of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import normalized_text
from icechunk_spark.operators.dedup import (
    DUCK_SHINGLES,
    DUCK_TOKS,
    NGRAM_DF_CAP,
    shingles_col,
)

SPLIT_MOD = 10
EXISTING_MOD = 7  # doc_id % 10 < 7 -> existing corpus (70%)


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.withColumn("h", F.md5(normalized_text(F.col("text")))).withColumn(
        "is_ex", (F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD
    )
    new = base.filter(~F.col("is_ex")).select("doc_id", "h")

    # exact tier: hash present in the existing index
    ex_hash = (
        base.filter("is_ex").groupBy("h").agg(F.min("doc_id").alias("dup_exact"))
    )
    exact = new.join(ex_hash, "h", "left").select("doc_id", "dup_exact")

    # near tier: df-capped shingle universe over the WHOLE corpus
    # (deterministic and side-symmetric, so sizes and intersections
    # are consistent); candidates are strictly cross-side
    sh = base.select(
        "doc_id", "is_ex", F.explode(shingles_col(F.col("text"))).alias("s")
    )
    capped = sh.join(
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= NGRAM_DF_CAP
        ),
        "s",
    )
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ex_side = capped.filter("is_ex").select(F.col("doc_id").alias("ex_id"), "s")
    new_side = capped.filter(~F.col("is_ex")).select(
        F.col("doc_id").alias("new_id"), "s"
    )
    inter = (
        new_side.join(ex_side, "s")
        .groupBy("new_id", "ex_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    near = (
        inter.join(sizes.select(F.col("doc_id").alias("new_id"), F.col("sz").alias("sa")), "new_id")
        .join(sizes.select(F.col("doc_id").alias("ex_id"), F.col("sz").alias("sb")), "ex_id")
        # Jaccard >= 0.5 as pure integers: c/(sa+sb-c) >= 1/2 <=> 3c >= sa+sb
        .filter(3 * F.col("c") >= F.col("sa") + F.col("sb"))
        .groupBy("new_id")
        .agg(F.min("ex_id").alias("dup_near"))
        .withColumnRenamed("new_id", "doc_id")
    )

    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("dup_exact").isNotNull(), F.lit("exact"))
            .when(F.col("dup_near").isNotNull(), F.lit("near"))
            .alias("dup_kind"),
            F.coalesce("dup_exact", "dup_near").cast("bigint").alias("duplicate_of"),
        )
        .orderBy("doc_id")
    )


INCREMENTAL_DEDUP_SQL = f"""
WITH base AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
         doc_id % {SPLIT_MOD} < {EXISTING_MOD} AS is_ex,
         {DUCK_SHINGLES.strip().replace("toks", f"({DUCK_TOKS})")} AS sh
  FROM documents
), ex_hash AS (
  SELECT h, min(doc_id) AS dup_exact FROM base WHERE is_ex GROUP BY h
), new_docs AS (
  SELECT doc_id, h FROM base WHERE NOT is_ex
), sh AS (
  SELECT doc_id, is_ex, unnest(sh) AS s FROM base
), capped AS (
  SELECT sh.doc_id, sh.is_ex, sh.s
  FROM sh JOIN (SELECT s, count(*) AS df FROM sh GROUP BY s
                HAVING count(*) <= {NGRAM_DF_CAP}) u ON sh.s = u.s
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id
), inter AS (
  SELECT n.doc_id AS new_id, e.doc_id AS ex_id, count(*) AS c
  FROM capped n JOIN capped e ON n.s = e.s
  WHERE NOT n.is_ex AND e.is_ex
  GROUP BY n.doc_id, e.doc_id
), near AS (
  SELECT new_id AS doc_id, min(ex_id) AS dup_near
  FROM inter
  JOIN sizes sa ON sa.doc_id = inter.new_id
  JOIN sizes sb ON sb.doc_id = inter.ex_id
  WHERE 3 * c >= sa.sz + sb.sz
  GROUP BY new_id
)
SELECT nd.doc_id,
       CASE WHEN eh.dup_exact IS NOT NULL THEN 'exact'
            WHEN nr.dup_near IS NOT NULL THEN 'near' END AS dup_kind,
       CAST(COALESCE(eh.dup_exact, nr.dup_near) AS BIGINT) AS duplicate_of
FROM new_docs nd
LEFT JOIN ex_hash eh ON nd.h = eh.h
LEFT JOIN near nr ON nd.doc_id = nr.doc_id
ORDER BY nd.doc_id
"""


QUERIES = {
    "incremental_dedup": incremental_dedup,
}

ORACLES = {
    "incremental_dedup": INCREMENTAL_DEDUP_SQL,
}
