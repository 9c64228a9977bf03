"""Deduplication operators for LLM-data pipelines (SURVEY.md §2c):
exact (content-hash), MinHash+LSH, n-gram Jaccard, SimHash, and
embedding near-dup.

Scale design:
- Exact dedup is one hash-groupBy (map-side combined).
- MinHash/LSH: signatures are computed per-row JVM-side (higher-order
  functions over the shingle array, md5 as the hash family), then the
  candidate join shuffles only (band_idx, band_key) pairs — O(docs ×
  n_bands) rows, never O(n²).  Verification recomputes exact Jaccard
  only on candidates.
- n-gram Jaccard uses the explode-join on shared shingles; at 100 TB
  you'd cap per-shingle doc frequency (hot-shingle skew) — kept exact
  here because the oracle must agree.
- All hashing is md5 (identical in Spark and DuckDB) so every
  candidate decision is reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables, table_parquet_files
from icechunk_spark.functions import (
    cosine,
    ensure_min_partitions_files,
    label_round_partitions,
    normalized_text,
    scoped_shuffle_partitions,
    tokenize,
)

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.5

# --- shared shingle expressions -----------------------------------------

def shingles_col(text: Column) -> Column:
    """Distinct 3-token shingles of the whitespace tokenization.

    Built by zipping three shifted slices of the token array — one
    O(n) pass — rather than slicing per index inside a transform
    (measured ~5× faster: per-index slice defeats codegen)."""
    toks = tokenize(text)
    n = F.size(toks)
    mk = F.zip_with(
        F.slice(toks, 1, n - 2),
        F.zip_with(
            F.slice(toks, 2, n - 2),
            F.slice(toks, 3, n - 2),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda a, bc: F.concat(a, F.lit(" "), bc),
    )
    return F.when(n >= 3, F.array_distinct(mk)).otherwise(
        F.array().cast("array<string>")
    )


DUCK_SHINGLES = """
list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)])
"""

def duck_toks(col: str = "text") -> str:
    """DuckDB twin of functions.tokenize over an arbitrary column
    expression — parameterized so derived oracles (e.g. the BPE
    trainer's lower(text)) compose it instead of substring-patching
    the shared constant."""
    return f"list_filter(string_split_regex({col}, '\\s+'), t -> t <> '')"


DUCK_TOKS = duck_toks()


# --- exact dedup ---------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup decision per document: group size and
    keep/drop flag (keep = smallest doc_id in its hash group)."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].withColumn("content_hash", F.md5(normalized_text(F.col("text"))))
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("keep", (F.col("doc_id") == F.min("doc_id").over(w)).cast("int"))
        .select("doc_id", "content_hash", "group_size", "keep")
        .orderBy("doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
       count(*) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS group_size,
       CAST(doc_id = min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS INT) AS keep
FROM documents
ORDER BY doc_id
"""


def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving set after exact dedup (first doc_id per content hash)."""
    t = load_tables(spark, sf_dir)
    df = t["documents"].withColumn("content_hash", F.md5(normalized_text(F.col("text"))))
    return (
        df.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    )


DEDUP_KEEP_FIRST_SQL = """
SELECT min(doc_id) AS doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
FROM documents
GROUP BY content_hash
ORDER BY doc_id
"""


# --- n-gram jaccard ------------------------------------------------------

# Hot-shingle cap: shingles appearing in more than this many documents
# are excluded from the UNIVERSE (sizes and join alike, so the Jaccard
# stays exact over the capped universe — the stop-phrase-removal
# trick).  A shingle with df=d produces O(d^2) join pairs; one
# boilerplate phrase shared by 1% of a 10^9-doc corpus would alone
# emit 10^14 pairs.  The oracle applies the identical cap.  At the
# test SFs max df is 3, so results are unchanged there.
NGRAM_DF_CAP = 100


def ngram_jaccard_pairs(docs: DataFrame, df_cap: int = NGRAM_DF_CAP) -> DataFrame:
    """Near-dup pairs (Jaccard >= threshold over the df-capped shingle
    universe) from a (doc_id, sh: array<string>) frame.  Split out so
    the skew test can drive it with an adversarial corpus."""
    ex_all = docs.select("doc_id", F.explode("sh").alias("s"))
    hot = (
        ex_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("s")
    )
    # the hot set is tiny by construction — broadcast the anti-join.
    # persist: ex feeds sizes AND both join sides — one explode +
    # anti-join pass instead of three
    ex = ex_all.join(broadcast(hot), "s", "left_anti").persist()
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 3))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-dup pairs with shingle-set Jaccard ≥ 0.5, found via the
    shared-shingle explode-join (no full cross product), with hot
    shingles df-capped out of the universe."""
    t = load_tables(spark, sf_dir)
    # persist: the shingle projection feeds several branches — without
    # it the split+distinct recomputes per branch.  Spread the scan
    # first: a byte-small documents parquet arrives as 1-2 splits and
    # would run the CPU-heavy tokenize+shingle pass nearly single-task
    # (no-op at real scale — the minhash/lsh_quality pattern)
    docs = (
        ensure_min_partitions_files(
            t["documents"].select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        )
        .select("doc_id", shingles_col(F.col("text")).alias("sh"))
        .persist()
    )
    return ngram_jaccard_pairs(docs)


NGRAM_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, {DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
), ex_all AS (SELECT doc_id, unnest(sh) AS s FROM sh),
hot AS (SELECT s FROM ex_all GROUP BY s HAVING count(*) > {NGRAM_DF_CAP}),
ex AS (SELECT doc_id, s FROM ex_all ANTI JOIN hot USING (s)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 3) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE shared * 1.0 / (sa.n_sh + sb.n_sh - shared) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# --- minhash + LSH -------------------------------------------------------

def _minhash_sigs(sh: Column) -> Column:
    """Array of N_HASHES min-hashes.

    Hash family: ONE md5 per shingle, then the k-th hash is the digest
    rotated left by 2k hex chars; the signature element is the
    lexicographic min over shingles.  Rotation makes the k functions
    disagree on ordering (distinct leading chars) at ~1/16th the cost
    of k independent md5 passes — the digest is computed once."""
    digests = F.transform(sh, F.md5)

    # NB: rotation columns are built by a helper, NOT a
    # `lambda d, k=k: ...` default arg — PySpark counts default args
    # when sizing higher-order-function lambdas, so a two-parameter
    # lambda receives (element, array_index) and k silently becomes
    # the index column.
    def rot(d: Column, k: int) -> Column:
        return F.concat(F.substring(d, 2 * k + 1, 32 - 2 * k), F.substring(d, 1, 2 * k))

    # one aggregate pass folds all 16 mins at once (struct accumulator)
    # instead of 16 transform+array_min rounds: same values, ~half the
    # generated code, no intermediate rotated arrays.  'g' sorts after
    # every hex digit, so it is the identity for least().
    init = F.struct(*[F.lit("g").alias(f"m{k}") for k in range(N_HASHES)])
    return F.aggregate(
        digests,
        init,
        lambda acc, d: F.struct(
            *[F.least(acc[f"m{k}"], rot(d, k)).alias(f"m{k}") for k in range(N_HASHES)]
        ),
        lambda acc: F.array(*[acc[f"m{k}"] for k in range(N_HASHES)]),
    )


def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket candidates, then exact
    Jaccard ≥ 0.5 verification on candidates only."""
    t = load_tables(spark, sf_dir)
    # repartition first: a compact parquet text file arrives as few
    # input splits, and the per-row shingle+signature work is the CPU
    # hot spot — spread it across the cluster before computing, not
    # after.
    base = (
        t["documents"]
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", shingles_col(F.col("text")).alias("sh"))
    )
    return minhash_pairs_from_shingles(base)


def minhash_pairs_from_shingles(sh_docs: DataFrame) -> DataFrame:
    """The LSH pair pipeline over an existing (doc_id, sh) frame —
    split from minhash_lsh (r14) so compositions that already hold a
    shingle frame (lsh_quality shares ONE persisted shingle pass
    between the exact and LSH sides) skip the second tokenize+shingle
    pass over the corpus.  Identical construction to the registered
    query: filter empty, signatures, bands, verify."""
    # persist: signatures feed the band explode AND both sides of the
    # verify join — compute once.
    docs = (
        sh_docs
        .filter(F.size("sh") > 0)
        .withColumn("sig", _minhash_sigs(F.col("sh")))
        .persist()
    )
    bands = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * ROWS_PER_BAND + r + 1)
                                    for r in range(ROWS_PER_BAND)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")
    # persist: the self-join's two sides get NO exchange reuse under
    # AQE (separate query stages), so without this the 16-md5 band-key
    # projection runs once per side over the cached signatures
    bands = bands.persist()
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cands.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn("jaccard", F.round(jac, 3))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


_SIG_ITEMS = ", ".join(
    f"list_min(list_transform(sh, s -> substr(md5(s), {2 * k + 1}, {32 - 2 * k}) || substr(md5(s), 1, {2 * k})))"
    for k in range(N_HASHES)
)
_BAND_ITEMS = ", ".join(
    "md5("
    + " || '|' || ".join(f"sig[{b * ROWS_PER_BAND + r + 1}]" for r in range(ROWS_PER_BAND))
    + f") AS band_{b}"
    for b in range(N_BANDS)
)
_BAND_UNNEST = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, band_{b} AS band_key FROM sigs" for b in range(N_BANDS)
)

# shared CTE chain: shingles → signatures → bands → verified pairs
# (reused by the connected-components cluster oracle below)
_MINHASH_CTES = f"""sh AS (
  SELECT doc_id, {DUCK_SHINGLES} AS sh
  FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents)
  WHERE len({DUCK_SHINGLES}) > 0
), sigs AS (
  SELECT doc_id, sh, [{_SIG_ITEMS}] AS sig FROM (SELECT doc_id, sh FROM sh) t(doc_id, sh)
), sigb AS (
  SELECT doc_id, {_BAND_ITEMS} FROM sigs
), bands AS (
  {_BAND_UNNEST.replace('FROM sigs', 'FROM sigb')}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), verified AS (
  SELECT doc_a, doc_b,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
               (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 3) AS jaccard
  FROM cands
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
  WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= {JACCARD_THRESHOLD}
)"""

MINHASH_LSH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, jaccard FROM verified
ORDER BY doc_a, doc_b
"""


# --- duplicate clustering (connected components) -------------------------

# Above this many documents (parquet-footer count, no job; the
# pairblocks dispatch pattern) the min-label rounds iterate over the
# PAIR-GRAPH NODES only and singletons attach once at the end — each
# round then shuffles O(dup-graph) label rows instead of O(corpus).
# Below it the all-docs form wins: the final attach join costs more
# than the tiny rounds save.  Measured (tools/ab_dedup_cluster.py
# whole-op + tools/ab_cluster_rounds.py component, min-of-N): 5k docs
# all-docs wins 3.43 vs 3.68 s; 50k all-docs 6.67 vs 7.16 s; 500k TIE
# (whole-op 25.7 vs 25.2, rounds 1.51 vs 1.66 s); 5M docs subgraph
# wins the rounds 2.3x (9.09 vs 4.02 s min, 3/4 trials head-to-head).
# Threshold between the measured tie and the measured win; full data
# in OPTIMIZATION_r14.md.
DEDUP_SUBGRAPH_MIN_DOCS = 1_000_000


def _docs_rows(docs: DataFrame, sf_dir: str) -> int:
    """Documents row count for the dispatch: free footer read; zero
    (nested layout lists no files) is unknown → one Spark count, so
    the dispatch never misreads a big table as small."""
    from icechunk_spark.operators.negatives_ann import _table_rows_from_footer

    n = _table_rows_from_footer(sf_dir, "documents")
    return n if n > 0 else docs.count()


def _min_label_propagate(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Min-label propagation rounds shared by both dedup_cluster
    paths.  ``labels`` seeds (doc_id, cluster_id=doc_id); duplicate
    seed rows are fine (round-1 groupBy dedups; min unaffected)."""
    cached = labels  # the (possibly) persisted frame backing labels
    for _ in range(64):  # bound: diameter of the near-dup graph
        prop = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), F.col("cluster_id"), F.lit(False).alias("own")
        )
        # one aggregation yields BOTH the new label (min over own +
        # propagated) and the old one (min over own rows only), so
        # convergence detection costs a filter on the same cached
        # frame instead of a second join+shuffle per round
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
    return labels


def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the MinHash-LSH
    pair graph — every document labeled with the smallest doc_id it
    can reach (its cluster id); singletons label themselves.

    Iterative min-label propagation: each round is one join + one
    groupBy-min, both shuffling only (doc_id, label) pairs, so a round
    costs O(edges) regardless of cluster shape; rounds needed = graph
    diameter (near-dup graphs are shallow).  The driver sees only the
    per-round convergence count, never the labels.

    At >= DEDUP_SUBGRAPH_MIN_DOCS documents the rounds run over the
    pair-graph nodes only (seeded from the edge endpoints) and the
    corpus attaches once at the end via a left join + coalesce —
    identical labels (propagation never changes a singleton's label,
    so excluding singletons from the rounds is value-neutral), but
    each round's shuffle scales with the dup graph, not the corpus."""
    pairs = minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    # symmetrize by exploding both directions from each pair row — a
    # union of two projections of `pairs` would run the whole LSH
    # candidate+verify pipeline once PER BRANCH (AQE compiles union
    # branches as separate query stages, no exchange reuse; the
    # ngram_containment lesson)
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
    t = load_tables(spark, sf_dir)
    n_docs = _docs_rows(t["documents"], sf_dir)
    # r15 (VERDICT r14 #3): the min-label rounds shuffle a label frame
    # of at most n_docs rows; at the session's full shuffle width each
    # round pays per-partition floors (driver 8-vs-32-core ratio 0.57
    # at sf0.1).  Scope the rounds to a volume-derived width — at
    # scale the cap (= session parallelism) rules and this is a no-op.
    # Materialize `edges` FIRST so the minhash pipeline's own shuffles
    # keep the session width (only the rounds should narrow).
    n_parts = label_round_partitions(spark, n_docs)
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if n_parts < sess_parts:
        edges.count()
    with scoped_shuffle_partitions(spark, n_parts):
        if n_docs >= DEDUP_SUBGRAPH_MIN_DOCS:
            # every pair-graph node appears as src after
            # symmetrization; duplicate seeds collapse in round 1's
            # groupBy
            seed = edges.select(
                F.col("src").alias("doc_id"), F.col("src").alias("cluster_id")
            )
            labels = _min_label_propagate(edges, seed)
            out = (
                t["documents"]
                .select("doc_id")
                .join(labels, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                )
            )
        else:
            seed = t["documents"].select(
                F.col("doc_id"), F.col("doc_id").alias("cluster_id")
            ).persist()
            out = _min_label_propagate(edges, seed)
    edges.unpersist()
    return out.select("doc_id", "cluster_id").orderBy("doc_id")


DEDUP_CLUSTER_SQL = f"""
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
)
SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc
ORDER BY doc_id
"""


def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., 'Connected Components in MapReduce and Beyond') —
    the O(log n)-round variant that replaces min-label propagation's
    O(diameter) rounds at web scale.  Each round is one groupBy-min +
    one join over (node, node) pairs; the driver sees only a
    convergence probe per round.  Final labels equal the component
    minimum, so the recursive-CTE oracle is shared with
    dedup_cluster."""
    pairs = minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")

    def symmetrize(e: DataFrame) -> DataFrame:
        # explode both directions from one row (never union two
        # projections of the input — each branch would recompute it)
        return (
            e.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u"), F.col("v")),
                        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                    )
                ).alias("p")
            )
            .select("p.*")
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def star_round(e: DataFrame, large: bool) -> DataFrame:
        mins = e.groupBy("u").agg(F.min("v").alias("mn"))
        wm = e.join(mins, "u").withColumn("m", F.least("u", "mn"))
        # each wm row yields (u, m), plus (v, m) when the star rule
        # moves v — one pass over the join output instead of a union
        # whose branches would each recompute the join
        moved = F.col("v") > F.col("u") if large else F.col("v") < F.col("u")
        keep = F.struct(F.col("u"), F.col("m").alias("v"))
        move = F.struct(F.col("v").alias("u"), F.col("m").alias("v"))
        new = wm.select(
            F.explode(
                F.when(moved, F.array(keep, move)).otherwise(F.array(keep))
            ).alias("p")
        ).select("p.*")
        return symmetrize(new)

    # localCheckpoint truncates lineage each round — without it the
    # logical plan doubles per iteration and the driver blows the
    # analyzer stack long before the data is large
    edges = symmetrize(pairs.toDF("u", "v")).localCheckpoint(eager=True)
    # r15: the star rounds shuffle O(dup-graph) edge rows — scope them
    # to a volume-derived width like dedup_cluster's min-label rounds
    # (the eager checkpoint above already materialized the minhash
    # pipeline at the session width).  Cap rules at scale: no-op.
    t = load_tables(spark, sf_dir)
    with scoped_shuffle_partitions(
        spark, label_round_partitions(spark, _docs_rows(t["documents"], sf_dir))
    ):
        for _ in range(32):  # O(log n) expected; 32 is a far-out backstop
            stepped = star_round(star_round(edges, large=True), large=False).localCheckpoint(
                eager=True
            )
            changed = (
                stepped.subtract(edges).limit(1).count()
                + edges.subtract(stepped).limit(1).count()
            )
            edges = stepped
            if changed == 0:
                break
        labels = edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("cluster_id")
        )
    out = (
        t["documents"]
        .select("doc_id")
        .join(labels.withColumnRenamed("u", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )
        .orderBy("doc_id")
    )
    return out


# --- simhash (rows-only: 32-bit bit-voting isn't reasonable oracle SQL) --

SIMHASH_BITS = 32
HAMMING_MAX = 3


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash near-dup pairs (hamming ≤ 3), candidates bucketed
    by 8-bit blocks (a pair within hamming 3 shares ≥1 of 4 blocks)."""
    t = load_tables(spark, sf_dir)
    # scan spread A/B'd and REJECTED here (r14: 1.98 -> 2.19 s): the
    # 32 per-bit vote sums partial-aggregate map-side, so the explode
    # stage is lighter than the repartition it would buy
    toks = t["documents"].select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    toks = toks.withColumn("h", h)
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(1) * 2 - 1).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sim = votes.select(
        "doc_id",
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(0) for i in range(SIMHASH_BITS)],
            F.lit(0),
        )
        .cast("bigint")
        .alias("simhash"),
    )
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk_idx"),
                        F.shiftright(F.col("simhash"), i * 8).bitwiseAND(255).alias("blk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.blk_idx", "e.blk")
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


# --- embedding near-dup --------------------------------------------------

# Banded sign-LSH over n_bands * band_bits = 32 sign bits (vs the 4-bit
# single bucket this replaces, whose within-bucket self-join was
# O(n^2/16)).  A pair is a candidate iff it agrees on EVERY bit of at
# least one band — per band the join key space is 2^band_bits, so the
# shuffle is n_bands joins of O(n^2 / 2^band_bits) expected pairs.  At
# real near-dup thresholds (cos >= 0.95, per-bit agreement ~0.9) four
# 8-bit bands give ~90% recall; at 10^9 vectors raise band_bits to 16
# (65k buckets/band) — both are parameters below, and the oracle SQL is
# generated from the same parameters so they stay in lockstep.
NEARDUP_BANDS = 4
NEARDUP_BAND_BITS = 8
NEARDUP_THRESHOLD = 0.40  # demo threshold: the test embeddings are random


def _sign_band(col: Column, band: int, bits: int) -> Column:
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(col, band * bits + i + 1) >= 0, "1").otherwise("0")
            for i in range(bits)
        ],
    )


def neardup_candidates(
    emb: DataFrame, n_bands: int = NEARDUP_BANDS, band_bits: int = NEARDUP_BAND_BITS
) -> DataFrame:
    """Candidate pairs (vec_a, vec_b, ea, eb) sharing >= 1 sign band.
    Exposed separately so tests can assert the candidate cardinality
    stays far below n^2/2."""
    bands = emb.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[_sign_band(F.col("embedding"), b, band_bits) for b in range(n_bands)])
        ).alias("band_idx", "band_key"),
    )
    a = bands.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "ea", "eb")
        .dropDuplicates(["vec_a", "vec_b"])  # a pair may match several bands
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: banded sign-LSH candidates, then
    cosine-threshold verify on candidates only."""
    t = load_tables(spark, sf_dir)
    cands = neardup_candidates(t["embeddings"])
    return (
        cands.withColumn("cos_sim", F.round(cosine(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    )


def _neardup_sql(n_bands: int, band_bits: int, threshold: float) -> str:
    """DuckDB mirror generated from the SAME banding parameters."""

    def band_expr(b: int) -> str:
        cases = ", ".join(
            f"CASE WHEN embedding[{b * band_bits + i + 1}] >= 0 THEN '1' ELSE '0' END"
            for i in range(band_bits)
        )
        return f"concat({cases})"

    bands = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {band_expr(b)} AS band_key FROM embeddings"
        for b in range(n_bands)
    )
    cos = (
        "list_sum(list_transform(list_zip(a.embedding, c.embedding),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )
    return f"""
WITH bands AS (
  {bands}
), cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.vec_id < y.vec_id
)
SELECT vec_a, vec_b, round({cos}, 4) AS cos_sim
FROM cand
JOIN embeddings a ON a.vec_id = vec_a
JOIN embeddings c ON c.vec_id = vec_b
WHERE round({cos}, 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


EMBEDDING_NEARDUP_SQL = _neardup_sql(NEARDUP_BANDS, NEARDUP_BAND_BITS, NEARDUP_THRESHOLD)


# --- cross-doc duplicate spans (exact-substring dedup) -------------------

SPAN_K = 8  # gram width in tokens
MIN_SPAN = 16  # report pairs sharing a run of >= this many tokens
SPAN_DF_CAP = 50  # grams in more than this many rows are boilerplate


def cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate SPANS across documents (the Lee et al.
    'Deduplicating Training Data' signal, cross-document form): pairs
    of docs sharing a verbatim run of >= MIN_SPAN tokens, with the
    longest shared run per pair.

    Shape: positional K-grams -> df-capped gram join (same hot-gram
    bound as ngram_jaccard) -> runs of consecutive positions merged
    per (pair, diagonal) with the classic pos - row_number() grouping
    — one window, no per-pair quadratic scan.  A matched diagonal run
    of c grams is a shared span of c + K - 1 tokens."""
    t = load_tables(spark, sf_dir)
    # spread the byte-small scan before the positional-gram explode
    # (CPU-heavy array_join per gram; no-op at real scale)
    docs = ensure_min_partitions_files(
            t["documents"].select("doc_id", "text"),
            table_parquet_files(sf_dir, "documents"),
        ).select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    )
    grams_arr = F.when(
        F.size("toks") >= SPAN_K,
        F.expr(
            f"transform(sequence(0, size(toks) - {SPAN_K}),"
            f" i -> struct(i AS pos, array_join(slice(toks, i + 1, {SPAN_K}), ' ') AS gram))"
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    ex_all = (
        docs.select("doc_id", F.explode(grams_arr).alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    hot = (
        ex_all.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SPAN_DF_CAP)
        .select("gram")
    )
    # persist: ex feeds both join sides — one positional-gram explode
    # + anti-join pass instead of two
    ex = ex_all.join(broadcast(hot), "gram", "left_anti").persist()
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "gram")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "gram")
    matches = a.join(b, "gram").filter(F.col("doc_a") < F.col("doc_b"))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        matches.withColumn("diag", F.col("pa") - F.col("pb"))
        .withColumn("grp", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg((F.count(F.lit(1)) + SPAN_K - 1).alias("span_tokens"))
        .filter(F.col("span_tokens") >= MIN_SPAN)
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.max("span_tokens").alias("max_span_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


CROSS_DOC_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKS} AS toks FROM documents
), ex_all AS (
  SELECT doc_id, g.pos, g.gram FROM (
    SELECT doc_id,
           unnest([{{'pos': i - 1,
                     'gram': array_to_string(toks[i:i + {SPAN_K} - 1], ' ')}}
                   FOR i IN range(1, len(toks) - {SPAN_K} + 2)]) AS g
    FROM toks
  )
), hot AS (
  SELECT gram FROM ex_all GROUP BY gram HAVING count(*) > {SPAN_DF_CAP}
), ex AS (
  SELECT doc_id, pos, gram FROM ex_all ANTI JOIN hot USING (gram)
), matches AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
         a.pos - b.pos AS diag
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
), runs AS (
  SELECT doc_a, doc_b, diag,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp,
         pa
  FROM matches
), spans AS (
  SELECT doc_a, doc_b, count(*) + {SPAN_K} - 1 AS span_tokens
  FROM runs GROUP BY doc_a, doc_b, diag, grp
  HAVING count(*) + {SPAN_K} - 1 >= {MIN_SPAN}
)
SELECT doc_a, doc_b, count(*) AS n_spans,
       CAST(max(span_tokens) AS BIGINT) AS max_span_tokens
FROM spans GROUP BY doc_a, doc_b
ORDER BY doc_a, doc_b
"""


def _simhash_sql() -> str:
    """DuckDB mirror of the banded simhash pipeline.  Note the 4x8-bit
    block bucketing is EXHAUSTIVE for hamming <= 3 (pigeonhole: 3 bit
    flips touch at most 3 of the 4 blocks, so one block always
    matches), so this oracle checks full equality of the operator, not
    a sampled invariant.  Token hashes are the same
    md5-prefix-as-int32 on both engines; DuckDB lacks conv(hex), so
    the hex digits are folded positionally."""
    hex2int = " + ".join(
        f"(strpos('0123456789abcdef', substr(hh, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
), hh AS (
  SELECT doc_id, substr(md5(tok), 1, 8) AS hh FROM toks
), hashed AS (
  SELECT doc_id, CAST({hex2int} AS BIGINT) AS h FROM hh
), votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
), sim AS (
  SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
), blocks AS (
  SELECT doc_id, simhash, b AS blk_idx, (simhash >> (b * 8)) & 255 AS blk
  FROM sim, (SELECT unnest([0, 1, 2, 3]) AS b) t
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM blocks a JOIN blocks b
    ON a.blk_idx = b.blk_idx AND a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs
WHERE hamming <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


SIMHASH_SQL = _simhash_sql()


def lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuning diagnostic for the MinHash-LSH dedup: recall of the
    banded pipeline against exact shared-shingle ground truth (and
    precision, which the candidate-verify stage keeps at 1 over the
    shared universe).  A production pipeline runs this on a sample
    before committing to a band configuration — recall here IS the
    fraction of near-dups the 100 TB dedup will actually catch.

    Composed from the two existing pipelines (one row out — both
    sides aggregate to counts before the final join):
    exact = ngram_jaccard pairs (df-capped universe),
    lsh   = minhash_lsh pairs (band-bucket candidates + verify)."""
    t = load_tables(spark, sf_dir)
    # ONE shingle pass feeds both pipelines (r14): the exact side and
    # the LSH side previously each tokenized+shingled the corpus;
    # repartition spreads the CPU-heavy shingle work over the cluster
    # (the byte-small-scan lesson) before it is computed and cached
    docs = (
        t["documents"]
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", shingles_col(F.col("text")).alias("sh"))
        .persist()
    )
    # persist both pair sets: each feeds a count AND the recall join —
    # without it the full exact/LSH pipelines execute twice
    exact = ngram_jaccard_pairs(docs).select("doc_a", "doc_b").persist()
    lsh = minhash_pairs_from_shingles(docs).select("doc_a", "doc_b").persist()
    matched = exact.join(lsh, ["doc_a", "doc_b"]).count()
    n_exact = exact.count()
    n_lsh = lsh.count()
    row = [
        (
            n_exact,
            n_lsh,
            matched,
            round(matched / n_exact, 6) if n_exact else None,
            round(matched / n_lsh, 6) if n_lsh else None,
        )
    ]
    from icechunk_spark.engine import local_df

    return local_df(
        spark,
        row,
        "n_exact bigint, n_lsh bigint, n_matched bigint, recall double, precision double",
    )


LSH_QUALITY_SQL = f"""
WITH {_MINHASH_CTES},
lsh AS (SELECT doc_a, doc_b FROM verified),
exact AS (SELECT doc_a, doc_b FROM ({NGRAM_JACCARD_SQL})),
m AS (SELECT count(*) AS n_matched FROM exact JOIN lsh USING (doc_a, doc_b)),
e AS (SELECT count(*) AS n_exact FROM exact),
l AS (SELECT count(*) AS n_lsh FROM lsh)
SELECT n_exact, n_lsh, n_matched,
       CASE WHEN n_exact > 0 THEN round(n_matched / n_exact, 6) END AS recall,
       CASE WHEN n_lsh > 0 THEN round(n_matched / n_lsh, 6) END AS precision
FROM e, l, m
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_keep_first": dedup_exact_keep_first,
    "ngram_jaccard": ngram_jaccard,
    "minhash_lsh": minhash_lsh,
    "dedup_cluster": dedup_cluster,
    "dedup_cluster_star": dedup_cluster_star,
    "simhash": simhash,
    "embedding_neardup": embedding_neardup,
    "cross_doc_spans": cross_doc_spans,
    "lsh_quality": lsh_quality,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_exact_keep_first": DEDUP_KEEP_FIRST_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "minhash_lsh": MINHASH_LSH_SQL,
    "dedup_cluster": DEDUP_CLUSTER_SQL,
    "dedup_cluster_star": DEDUP_CLUSTER_SQL,  # same contract: component min
    "simhash": SIMHASH_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    "cross_doc_spans": CROSS_DOC_SPANS_SQL,
    "lsh_quality": LSH_QUALITY_SQL,
}
