"""sf10 decade probe (VERDICT r7 #1): materialize a 100x scale-up of
sf0.1 (~60M-row lineitem), then time the 13 headline queries plus the
six r7 "floor-weak" queries (q1/q3/q5/q9/knn_brute_force/
dsir_importance — four already in the headline set) on BOTH engines.

Purpose: q1/q3/q5/q9/knn/dsir are plan-clean but sat >2x behind
DuckDB at sf0.1 and sf1 purely on Spark's ~0.3-0.8s per-query
scheduling/codegen floor.  The sf0.1->sf1 trend (DuckDB's cost grows
with data, Spark's floor doesn't) predicts one more decade flips
them; this script produces that datapoint instead of arguing it.

Usage:
    python tools/bench_sf10.py            # build (once) + bench both engines
    python tools/bench_sf10.py --build    # build only

Scale-up design (same fairness contract as tools/bench_sf1.py):
- Facts AND dims scale 100x with consistent key shifts (same offset on
  both sides of every FK) so join selectivities and group cardinalities
  scale like real data; region/nation stay fixed (fixed in TPC-H too).
- documents replica r applies an AFFINE substitution cipher
  c -> a*c + b (mod 26) with (a, b) = (coprime[r // 26], r % 26).
  rot-r (the sf1 scheme) only yields 26 distinct permutations, so at
  100 replicas r and r+26 would be byte-identical — inflating dup
  pairs ~4x.  Distinct (a, b) pairs give 100 distinct permutations:
  replicas of one doc are NOT near-duplicates of each other (disjoint
  shingles), dup pairs within a replica are exactly the original dup
  pairs — 100x docs, 100x dup pairs, same dup RATE.
- embeddings replica r adds r*1e-3 to every component: distinct
  vectors, same within-replica geometry, same top-k work per query.
- Every scaled table lands as many parquet files (a row group is the
  split atom — the sf1 lesson: one file = one scan thread for BOTH
  engines).

Timing protocol (r10, VERDICT r9 #9): per-query INTERLEAVED
min-of-3 — each pass times a query on Spark then immediately on
DuckDB, so engine ratios stop absorbing box weather that drifts
between a Spark-only and a DuckDB-only phase.  The adaptive cutoff
applies per (engine, query): a first run over ADAPTIVE_CUTOFF seconds
skips its re-runs (not noise-limited; re-running DuckDB's 14-minute
dedup_cluster twice triples wall-clock for zero information).  The
JSON records n_runs per engine+query so the protocol is auditable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = 100
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SF10_DIR", "/tmp/sf10_synth")
# First run over the cutoff skips the re-runs.  200 s (was 30): the
# r10 interleaved run showed a 30 s cutoff LOCKS IN a contaminated
# first run — spark minhash_lsh recorded 85 s cold-under-pressure vs
# 22 s warm because the cutoff denied its retries.  The cutoff exists
# only to avoid tripling DuckDB's 14-minute dedup_cluster; 200 s keeps
# every minhash-class query (both engines ~20-160 s) on min-of-3.
ADAPTIVE_CUTOFF = 200.0

O_OFF = 100_000_000  # orderkey
C_OFF = 10_000_000  # custkey
P_OFF = 10_000_000  # partkey
S_OFF = 1_000_000  # suppkey
D_OFF = 10_000_000  # doc_id
V_OFF = 10_000_000  # vec_id
E_OFF = 100_000_000  # event_id / user_id


def _cipher_alphabets(r: int) -> tuple[str, str]:
    """Distinct affine permutation of the alphabet per replica."""
    coprime = (1, 3, 5, 7)  # gcd(a, 26) == 1; supports 4*26 = 104 replicas
    a, b = coprime[r // 26], r % 26
    lower = "".join(chr(((a * i + b) % 26) + ord("a")) for i in range(26))
    return lower, lower.upper()


def build(spark) -> None:
    from pyspark.sql import functions as F

    from icechunk_spark.catalog import load_tables

    t = load_tables(spark, SRC)
    os.makedirs(OUT, exist_ok=True)

    def reps(df):
        return df.crossJoin(
            spark.range(REPLICATE).select(F.col("id").cast("int").alias("__r"))
        )

    def shift(col, off):
        # bigint math: off * 99 overflows int32 under ANSI mode
        return (
            F.col(col).cast("long") + F.lit(off).cast("long") * F.col("__r").cast("long")
        ).alias(col)

    def write(df, name, n_files: int | None = None):
        out = df.drop("__r")
        if n_files:
            out = out.repartition(n_files)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{name}.parquet"))

    t["region"].write.mode("overwrite").parquet(os.path.join(OUT, "region.parquet"))
    t["nation"].write.mode("overwrite").parquet(os.path.join(OUT, "nation.parquet"))

    write(
        reps(t["customer"]).select(
            shift("c_custkey", C_OFF), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "__r"
        ),
        "customer",
        n_files=16,
    )
    write(
        reps(t["supplier"]).select(
            shift("s_suppkey", S_OFF), "s_name", "s_nationkey", "s_acctbal", "__r"
        ),
        "supplier",
        n_files=4,
    )
    write(
        reps(t["part"]).select(
            shift("p_partkey", P_OFF), "p_name", "p_brand", "p_type", "p_size", "p_retailprice", "__r"
        ),
        "part",
        n_files=16,
    )
    write(
        reps(t["orders"]).select(
            shift("o_orderkey", O_OFF),
            shift("o_custkey", C_OFF),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            "__r",
        ),
        "orders",
        n_files=32,
    )
    write(
        reps(t["lineitem"]).select(
            shift("l_orderkey", O_OFF),
            shift("l_partkey", P_OFF),
            shift("l_suppkey", S_OFF),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
            "__r",
        ),
        "lineitem",
        n_files=64,
    )
    # documents: per-replica affine substitution cipher (see module doc)
    lower0, upper0 = _cipher_alphabets(0)
    ciphered = F.col("text")
    for r in range(1, REPLICATE):
        lo, up = _cipher_alphabets(r)
        ciphered = F.when(
            F.col("__r") == r, F.translate(F.col("text"), lower0 + upper0, lo + up)
        ).otherwise(ciphered)
    write(
        reps(t["documents"]).select(
            shift("doc_id", D_OFF), ciphered.alias("text"), "lang", "source", "n_chars", "__r"
        ),
        "documents",
        n_files=32,
    )
    write(
        reps(t["embeddings"]).select(
            shift("vec_id", V_OFF),
            F.expr("transform(embedding, x -> CAST(x + __r * 0.001 AS FLOAT))").alias("embedding"),
            "label",
            "__r",
        ),
        "embeddings",
        n_files=32,
    )
    write(
        reps(t["events"]).select(
            shift("event_id", E_OFF),
            "ts",
            shift("user_id", E_OFF),
            "event_type",
            "value",
            "props",
            "__r",
        ),
        "events",
        n_files=32,
    )


# the two r7 floor-weak queries not already in bench.py's headline set
SF10_EXTRA = ["dsir_importance"]

# the r8-new operators: measured separately (--new-ops) so the decade
# curve exists for them too without re-running the 4-hour headline set
NEW_OPS = [
    "semdedup",
    "line_dedup",
    "ngram_containment",
    "idf_doc_score",
    "length_mad_outliers",
    "dedup_cascade",
    "clean_reassemble",
    "quality_quantile_norm",
    "event_decay_score",
    "mmr_diversify",
    "fps_sample",
    # latest-r8 additions (their sf10 rows live in BASELINE.md's
    # "latest-r8 ops" table; listed here so --new-ops reproduces them)
    "weighted_sample",
    "ngram_diversity",
    "pii_stats",
    "pii_redact",
    "curate_select",
]

# the r10 second-session operators: measured with --r10b-ops
R10B_OPS = [
    "chunk_documents",
    "nb_source_classifier",
    "random_projection",
    "bpe_encode_corpus",
    "type_cooccurrence",
    "pq_quantize",
    "stream_psi_drift",
    "conformal_outliers",
    "hll_mergeable_distinct",
    "sparse_retrieval",
    "welch_drift_ttest",
    "hybrid_retrieval_rrf",
]


def _query_names() -> list[str]:
    from bench import BENCH_QUERIES

    for a in sys.argv:
        if a.startswith("--only="):  # targeted re-measurement
            return a.split("=", 1)[1].split(",")
    if "--new-ops" in sys.argv:
        return NEW_OPS
    if "--r10b-ops" in sys.argv:
        return R10B_OPS
    return BENCH_QUERIES + SF10_EXTRA


def bench_interleaved(spark) -> dict:
    """Per-query interleaved min-of-N across BOTH engines (VERDICT r9
    #9): each pass times a query on Spark then immediately on DuckDB,
    so a ratio can no longer absorb box weather that drifted between
    a Spark-only phase and a DuckDB-only phase (the r9 record's
    dedup_cluster drifted 35.5->45.1 s that way).  The adaptive
    cutoff still applies per (engine, query): a first run over
    ADAPTIVE_CUTOFF seconds is not re-run — it is not noise-limited,
    and re-running DuckDB's 14-minute dedup_cluster twice would
    triple the wall-clock for zero information."""
    import duckdb

    from icechunk_spark.registry import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    names = _query_names()

    queries["q6_forecast_revenue"](spark, OUT).count()  # warm scan path
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("g", (F.col("id") % 4).cast("int"))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g int").count()
    warm.mapInPandas(lambda it: it, "id long, g int").count()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute("SET memory_limit='48GB'")
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{OUT}/{name}.parquet/*.parquet')"
        )

    sp: dict[str, float] = {}
    dd: dict[str, float] = {}
    sp_runs: dict[str, int] = {}
    dd_runs: dict[str, int] = {}
    for i in range(3):
        for name in names:
            if i == 0 or sp[name] < ADAPTIVE_CUTOFF:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[name](spark, OUT).count()
                el = time.perf_counter() - t0
                sp[name] = min(sp.get(name, 9e9), el)
                sp_runs[name] = sp_runs.get(name, 0) + 1
            if name in oracles and (i == 0 or dd[name] < ADAPTIVE_CUTOFF):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                el = time.perf_counter() - t0
                dd[name] = min(dd.get(name, 9e9), el)
                dd_runs[name] = dd_runs.get(name, 0) + 1
            print(
                f"pass {i} {name}: spark {sp.get(name)} duck {dd.get(name)}",
                file=sys.stderr,
            )
    return {
        "spark": {k: round(v, 3) for k, v in sp.items()},
        "duckdb": {k: round(v, 3) for k, v in dd.items()},
        "spark_n_runs": sp_runs,
        "duckdb_n_runs": dd_runs,
    }


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from icechunk_spark.engine import get_spark

    spark = get_spark("icechunk-spark-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet", "_SUCCESS")):
        print("building sf10 scale-up ...", file=sys.stderr)
        build(spark)
    if "--build" in sys.argv:
        spark.stop()
        return
    res = bench_interleaved(spark)
    spark.stop()
    sp, dd = res["spark"], res["duckdb"]
    print(
        json.dumps(
            {
                "metric": "sf10_only"
                if any(a.startswith("--only=") for a in sys.argv)
                else "sf10_new_ops"
                if "--new-ops" in sys.argv
                else "sf10_r10b_ops"
                if "--r10b-ops" in sys.argv
                else "sf10_headline_queries",
                "unit": "sec",
                "sf": 10.0,
                "protocol": "interleaved min-of-3 (adaptive cutoff per engine+query)",
                "adaptive_cutoff_sec": ADAPTIVE_CUTOFF,
                "spark_total": round(sum(v for k, v in sp.items() if k not in SF10_EXTRA), 3),
                "duckdb_total": round(sum(v for k, v in dd.items() if k not in SF10_EXTRA), 3),
                "extra_queries": SF10_EXTRA,
                "spark": sp,
                "duckdb": dd,
                "spark_n_runs": res["spark_n_runs"],
                "duckdb_n_runs": res["duckdb_n_runs"],
            }
        )
    )


if __name__ == "__main__":
    main()
