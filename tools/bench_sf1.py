"""sf1.0 bench datapoint (VERDICT r5 #6): materialize a 10x scale-up
of sf0.1 (consistent key shifts; per-replica substitution cipher on
document text so dup RATES are preserved, not inflated), then time the
13 headline queries on BOTH engines — Spark local[32] via bench.py's
exact method (min-of-3) and DuckDB 32-thread running the same oracle
SQL — to convert the "fixed floor vs scan slope" argument into a
measured crossover.

Usage:
    python tools/bench_sf1.py            # build (once) + bench both engines
    python tools/bench_sf1.py --build    # build only

The scale-up design (why this is a fair sf1):
- Facts AND dims scale 10x like TPC-H itself (lineitem/orders/customer/
  supplier/part/documents/embeddings/events); region/nation stay fixed
  (fixed in TPC-H too).  Replica r shifts every key by r*OFFSET with
  the SAME offset on both sides of each FK, so join selectivities and
  group cardinalities scale like real data.
- documents replica r applies a rot-r substitution cipher to the text:
  replicas of one doc are NOT near-duplicates of each other (disjoint
  shingles), while dup pairs WITHIN a replica are exactly the original
  dup pairs — 10x docs, 10x dup pairs, same dup rate, so dedup
  operators scale like a real corpus instead of an everything-matches
  pathology.
- embeddings replica r adds r*1e-3 to every component: distinct
  vectors, same geometry, same top-k work per query.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SF1_DIR", "/tmp/sf1_synth")

O_OFF = 10_000_000  # orderkey
C_OFF = 1_000_000  # custkey
P_OFF = 1_000_000  # partkey
S_OFF = 100_000  # suppkey
D_OFF = 1_000_000  # doc_id
V_OFF = 1_000_000  # vec_id
E_OFF = 10_000_000  # event_id / user_id

LOWER = string.ascii_lowercase
UPPER = string.ascii_uppercase


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
        return (F.col(col) + F.lit(off) * F.col("__r")).alias(col)

    def write(df, name, n_files: int | None = None):
        out = df.drop("__r")
        if n_files:
            # a 10x table landing as ONE parquet file would hand the
            # whole scan to one task — real sf1 data spans many splits
            out = out.repartition(n_files)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{name}.parquet"))

    # fixed dims: straight copy
    t["region"].write.mode("overwrite").parquet(os.path.join(OUT, "region.parquet"))
    t["nation"].write.mode("overwrite").parquet(os.path.join(OUT, "nation.parquet"))

    write(
        reps(t["customer"]).select(
            shift("c_custkey", C_OFF), "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "__r"
        ),
        "customer",
        n_files=4,
    )
    write(
        reps(t["supplier"]).select(
            shift("s_suppkey", S_OFF), "s_name", "s_nationkey", "s_acctbal", "__r"
        ),
        "supplier",
    )
    write(
        reps(t["part"]).select(
            shift("p_partkey", P_OFF), "p_name", "p_brand", "p_type", "p_size", "p_retailprice", "__r"
        ),
        "part",
        n_files=4,
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
        n_files=8,
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
        n_files=16,
    )
    # documents: rot-r substitution cipher keeps length/token structure
    # and preserves dup rates (see module docstring)
    ciphered = F.col("text")
    for r in range(1, REPLICATE):
        rot_l = LOWER[r:] + LOWER[:r]
        rot_u = UPPER[r:] + UPPER[:r]
        ciphered = F.when(
            F.col("__r") == r, F.translate(F.col("text"), LOWER + UPPER, rot_l + rot_u)
        ).otherwise(ciphered)
    write(
        reps(t["documents"]).select(
            shift("doc_id", D_OFF), ciphered.alias("text"), "lang", "source", "n_chars", "__r"
        ),
        "documents",
        n_files=8,
    )
    write(
        reps(t["embeddings"]).select(
            shift("vec_id", V_OFF),
            F.expr("transform(embedding, x -> CAST(x + __r * 0.001 AS FLOAT))").alias("embedding"),
            "label",
            "__r",
        ),
        "embeddings",
        n_files=8,
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
        n_files=8,
    )


# round-6/7/8 operators measured at sf1 IN ADDITION to the headline
# set (kept out of spark_total/duckdb_total so the totals stay
# comparable across rounds)
SF1_EXTRA = [
    "winnowing_fingerprint",
    "source_mixture_weights",
    "doc_token_histogram",
    "retention_cohorts",
    "embedding_covariance",
    "stream_topk_users",
    "dsir_importance",
    "ccnet_perplexity_buckets",
    # r8: semantic + line/containment curation ops
    "semdedup",
    "line_dedup",
    "ngram_containment",
    "idf_doc_score",
    "length_mad_outliers",
    "dedup_cascade",
    # late-r8: refinement/selection ops (refine_ext.py)
    "clean_reassemble",
    "quality_quantile_norm",
    "event_decay_score",
    "mmr_diversify",
]


def bench_spark(spark) -> dict[str, float]:
    from bench import BENCH_QUERIES, N_RUNS

    from icechunk_spark.registry import all_queries

    queries = all_queries()
    # warm exactly like bench.py
    queries["q6_forecast_revenue"](spark, OUT).count()
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("g", (F.col("id") % 4).cast("int"))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g int").count()
    warm.mapInPandas(lambda it: it, "id long, g int").count()

    out: dict[str, float] = {}
    for name in BENCH_QUERIES + SF1_EXTRA:
        best = float("inf")
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, OUT).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def bench_duckdb() -> dict[str, float]:
    import duckdb

    from bench import BENCH_QUERIES, N_RUNS

    from icechunk_spark.registry import all_oracles

    oracles = all_oracles()
    out: dict[str, float] = {}
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{OUT}/{name}.parquet/*.parquet')"
        )
    for name in BENCH_QUERIES + SF1_EXTRA:
        if name not in oracles:
            continue
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    from icechunk_spark.engine import get_spark

    spark = get_spark("icechunk-spark-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet", "_SUCCESS")):
        print("building sf1 scale-up ...", file=sys.stderr)
        build(spark)
    if "--build" in sys.argv:
        spark.stop()
        return
    sp = bench_spark(spark)
    spark.stop()
    dd = bench_duckdb()
    print(
        json.dumps(
            {
                "metric": "sf1_headline_queries",
                "unit": "sec",
                "sf": 1.0,
                "spark_total": round(sum(v for k, v in sp.items() if k not in SF1_EXTRA), 3),
                "duckdb_total": round(sum(v for k, v in dd.items() if k not in SF1_EXTRA), 3),
                "extra_queries": SF1_EXTRA,
                "spark": sp,
                "duckdb": dd,
            }
        )
    )


if __name__ == "__main__":
    main()
