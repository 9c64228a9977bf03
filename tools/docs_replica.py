"""Documents-only scale replica for the dedup_cluster crossover
measurement (r14 "not yet optimized" item): materialize documents at
REPLICATE x sf0.1 with the bench_sf10 affine-cipher scheme (same dup
RATE — replicas of a doc are not near-duplicates of each other), and
symlink every other table from the source dir so load_tables works.

dedup_cluster touches ONLY documents, so this is a valid scale probe
for it at a fraction of the full-replica build cost.

    python tools/docs_replica.py <replicate> <out_dir> [src_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sf10 import D_OFF, _cipher_alphabets  # noqa: E402  (tools sibling)


def build(replicate: int, out: str, src: str) -> None:
    from pyspark.sql import functions as F

    from icechunk_spark.catalog import TABLES, load_tables
    from icechunk_spark.engine import get_spark

    spark = get_spark("docs-replica")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, src)
    os.makedirs(out, exist_ok=True)

    reps = t["documents"].crossJoin(
        spark.range(replicate).select(F.col("id").cast("int").alias("__r"))
    )
    lower0, upper0 = _cipher_alphabets(0)
    ciphered = F.col("text")
    for r in range(1, replicate):
        lo, up = _cipher_alphabets(r)
        ciphered = F.when(
            F.col("__r") == r, F.translate(F.col("text"), lower0 + upper0, lo + up)
        ).otherwise(ciphered)
    scaled = reps.select(
        (
            F.col("doc_id").cast("long")
            + F.lit(D_OFF).cast("long") * F.col("__r").cast("long")
        ).alias("doc_id"),
        ciphered.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    n_files = max(4, min(32, replicate))
    scaled.repartition(n_files).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    for name in TABLES:
        if name == "documents":
            continue
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{name}.parquet"), dst)
    print(f"built {out}: documents x{replicate}, rest symlinked from {src}")
    spark.stop()


if __name__ == "__main__":
    rep = int(sys.argv[1])
    out_dir = sys.argv[2]
    src_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    build(rep, out_dir, src_dir)
