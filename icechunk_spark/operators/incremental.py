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


# --- persisted historical index (VERDICT r9 #3) ----------------------------

def build_dedup_index(
    spark: SparkSession, existing: DataFrame, buckets: int = 32, db_hint: str = ""
) -> str:
    """Materialize the historical side of incremental dedup as
    BUCKETED tables, built once and probed every night — the index
    the plain ``incremental_dedup`` query recomputes per run:

    - ``hash_index (h, dup_exact)``    bucketed by h: the exact tier.
    - ``postings (s, ex_id)``          bucketed+sorted by s: shingle
      occurrences whose existing-side df <= NGRAM_DF_CAP (hot
      shingles leave the index at BUILD time, so a probe can never
      fan out more than CAP rows per shingle).
    - ``ex_sizes (ex_id, sb)``         per-doc capped-universe sizes.
    - ``hot_shingles (s)``             the > CAP shingles (tiny: it
      holds only boilerplate keys), broadcast at probe time so the
      increment's sizes use the same universe.

    The nightly probe (``probe_dedup_index``) reads ONLY these tables
    plus the increment: no tokenize/shingle/md5 pass over the corpus,
    no corpus-wide df aggregation — the two corpus-sized shuffles the
    recompute pays.  Bucketing by the join keys means a probe join
    never exchanges the index side; a small increment broadcasts and
    the index is a pure column-pruned scan.  At 100 TB the postings
    table is additionally date/prefix-partitioned so small patches
    prune to index slices (functions/bucketing.py module notes).
    Nightly maintenance design (not an API here — the probe is the
    measured deliverable): kept increment docs APPEND into hash_index/
    postings (bucketed tables take insertInto appends), a (s, df)
    table is the authoritative universe so shingles that cross the cap
    after an append are filtered at probe time rather than deleted,
    and a periodic compaction rebuild restores the single-epoch
    universe — the LSM-style shape; per-doc sizes are exact relative
    to each doc's indexing epoch between compactions.

    Returns the database name (content-addressed, session-owned,
    atexit-reaped like bucketed_db's)."""
    from icechunk_spark.functions.bucketing import session_db

    db = session_db(spark, "ic_dedup_idx", "dedup_index", db_hint, buckets)
    # idempotency sentinel = the LAST-written table: an interrupted
    # build (crash between writes) must re-run, not read half an index
    if spark.catalog.tableExists(f"{db}.ex_sizes"):
        return db

    base = existing.select(
        "doc_id",
        F.md5(normalized_text(F.col("text"))).alias("h"),
        shingles_col(F.col("text")).alias("sh"),
    )
    (
        base.groupBy("h")
        .agg(F.min("doc_id").alias("dup_exact"))
        .repartition(buckets, "h")
        .write.format("parquet")
        .bucketBy(buckets, "h")
        .mode("overwrite")
        .saveAsTable(f"{db}.hash_index")
    )
    ex_sh = base.select(F.col("doc_id").alias("ex_id"), F.explode("sh").alias("s"))
    dfx = ex_sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    (
        dfx.filter(F.col("df") > NGRAM_DF_CAP)
        .select("s")
        .coalesce(1)
        .write.format("parquet")
        .mode("overwrite")
        .saveAsTable(f"{db}.hot_shingles")
    )
    postings = ex_sh.join(
        dfx.filter(F.col("df") <= NGRAM_DF_CAP).select("s"), "s"
    ).select("s", "ex_id")
    (
        postings.repartition(buckets, "s")
        .write.format("parquet")
        .bucketBy(buckets, "s")
        .sortBy("s")
        .mode("overwrite")
        .saveAsTable(f"{db}.postings")
    )
    (
        spark.table(f"{db}.postings")
        .groupBy("ex_id")
        .agg(F.count(F.lit(1)).alias("sb"))
        .repartition(buckets, "ex_id")
        .write.format("parquet")
        .bucketBy(buckets, "ex_id")
        .mode("overwrite")
        .saveAsTable(f"{db}.ex_sizes")
    )
    return db


#: the previous probe's persisted increment frame — unpersisted when
#: the next probe starts, so a long-lived nightly session holds at
#: most ONE cached increment (the leak a per-call persist would grow)
_LAST_PROBE_CACHE: list[DataFrame] = []


def probe_dedup_index(spark: SparkSession, db: str, increment: DataFrame) -> DataFrame:
    """Dedup ``increment`` against a persisted index (the nightly
    run): O(increment + index probe) — the increment is shingled and
    hashed, the corpus never is.  Universe note: candidate shingles
    are those with EXISTING-side df <= NGRAM_DF_CAP (the buildable
    definition — the plain query's corpus-wide cap needs the
    increment at cap time); increment sizes subtract the broadcast
    hot list so both sides measure the same universe."""
    # persist the hashed+shingled increment: it feeds the exact tier,
    # the size pass, and the candidate join — ONE scan + tokenize of
    # the increment instead of three (memory bound = increment size,
    # the quantity this whole design keeps small)
    while _LAST_PROBE_CACHE:
        _LAST_PROBE_CACHE.pop().unpersist()
    new = increment.select(
        "doc_id",
        F.md5(normalized_text(F.col("text"))).alias("h"),
        shingles_col(F.col("text")).alias("sh"),
    ).persist()
    _LAST_PROBE_CACHE.append(new)
    exact = new.join(spark.table(f"{db}.hash_index"), "h", "left").select(
        "doc_id", "dup_exact"
    )
    newsh = new.select("doc_id", F.explode("sh").alias("s"))
    sa = (
        newsh.join(F.broadcast(spark.table(f"{db}.hot_shingles")), "s", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sa"))
    )
    inter = (
        newsh.withColumnRenamed("doc_id", "new_id")
        .join(spark.table(f"{db}.postings"), "s")
        .groupBy("new_id", "ex_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    near = (
        inter.join(sa.select(F.col("doc_id").alias("new_id"), "sa"), "new_id")
        .join(spark.table(f"{db}.ex_sizes"), "ex_id")
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


def incremental_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of the persisted-index pipeline: build (once
    per session per sf_dir; repeat calls are catalog lookups) the index
    over the existing 70%, then run the nightly probe for the 30%
    increment.  Differs from ``incremental_dedup`` only in the cap
    universe (existing-side df, the buildable definition); the oracle
    mirrors that exactly.  tools/bench_incremental.py measures the
    O(increment) claim: probe cost stays flat when the indexed corpus
    grows 10x (BASELINE.md round-10)."""
    docs = load_tables(spark, sf_dir)["documents"]
    is_ex = (F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD
    # no module-level db cache: build_dedup_index is already an
    # idempotent catalog lookup per session, and a (sf_dir)-keyed
    # cache would hand a NEW session a dead session's db name
    db = build_dedup_index(spark, docs.filter(is_ex), buckets=32, db_hint=sf_dir)
    return probe_dedup_index(spark, db, docs.filter(~is_ex))


INCREMENTAL_DEDUP_INDEXED_SQL = f"""
WITH base AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
         doc_id % {SPLIT_MOD} < {EXISTING_MOD} AS is_ex,
         {DUCK_SHINGLES.strip().replace("toks", f"({DUCK_TOKS})")} AS sh
  FROM documents
), ex_sh AS (
  SELECT doc_id AS ex_id, unnest(sh) AS s FROM base WHERE is_ex
), dfx AS (
  SELECT s, count(*) AS df FROM ex_sh GROUP BY s
), postings AS (
  SELECT s, ex_id FROM ex_sh
  WHERE s IN (SELECT s FROM dfx WHERE df <= {NGRAM_DF_CAP})
), ex_sizes AS (
  SELECT ex_id, count(*) AS sb FROM postings GROUP BY ex_id
), ex_hash AS (
  SELECT h, min(doc_id) AS dup_exact FROM base WHERE is_ex GROUP BY h
), new_docs AS (
  SELECT doc_id, h FROM base WHERE NOT is_ex
), new_sh AS (
  SELECT doc_id, unnest(sh) AS s FROM base WHERE NOT is_ex
), sa AS (
  SELECT doc_id, count(*) AS sa FROM new_sh
  WHERE s NOT IN (SELECT s FROM dfx WHERE df > {NGRAM_DF_CAP})
  GROUP BY doc_id
), inter AS (
  SELECT n.doc_id AS new_id, p.ex_id, count(*) AS c
  FROM new_sh n JOIN postings p ON n.s = p.s
  GROUP BY n.doc_id, p.ex_id
), near AS (
  SELECT new_id AS doc_id, min(inter.ex_id) AS dup_near
  FROM inter
  JOIN sa ON sa.doc_id = inter.new_id
  JOIN ex_sizes ON ex_sizes.ex_id = inter.ex_id
  WHERE 3 * c >= sa.sa + ex_sizes.sb
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

QUERIES["incremental_dedup_indexed"] = incremental_dedup_indexed
ORACLES["incremental_dedup_indexed"] = INCREMENTAL_DEDUP_INDEXED_SQL
