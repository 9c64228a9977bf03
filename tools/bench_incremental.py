"""The O(increment) measurement for the persisted dedup index
(VERDICT r9 #3): the per-night cost must stay FLAT when the indexed
corpus grows 10x.

Protocol: build the historical index over the EXISTING side (doc_id %
10 < 7) of sf0.1 and of sf1 (10x the corpus), then probe the SAME
sf0.01 increment (doc_id % 10 >= 7, ~300 docs) against both, min-of-5
interleaved.  Contrast: the recompute shape (incremental_dedup, which
re-scans the corpus per run) timed over the same two corpus+increment
unions.  The claim holds if probe(sf1 index) / probe(sf0.1 index) is
~1 while recompute scales with the corpus.

Usage: python tools/bench_incremental.py
Writes one JSON line; recorded in BASELINE.md round-10.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from icechunk_spark.catalog import load_tables  # noqa: E402
from icechunk_spark.engine import get_spark  # noqa: E402
from icechunk_spark.operators.incremental import (  # noqa: E402
    EXISTING_MOD,
    SPLIT_MOD,
    build_dedup_index,
    probe_dedup_index,
)

CORPORA = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/tmp/sf1_synth"}
if "--sf10" in sys.argv:
    # the 100x point: same increment against a 500k-doc indexed corpus
    CORPORA["sf10"] = "/tmp/sf10_synth"
INCREMENT_DIR = "/root/testdata/sf0.01"
RUNS = 5


def main() -> None:
    spark = get_spark()
    is_ex = (F.col("doc_id") % SPLIT_MOD) < EXISTING_MOD
    increment = (
        load_tables(spark, INCREMENT_DIR)["documents"].filter(~is_ex).persist()
    )
    increment.count()

    dbs, build_secs, corpus_docs = {}, {}, {}
    for label, sf_dir in CORPORA.items():
        docs = load_tables(spark, sf_dir)["documents"]
        corpus_docs[label] = docs.filter(is_ex).count()
        t0 = time.time()
        dbs[label] = build_dedup_index(
            spark, docs.filter(is_ex), buckets=32, db_hint=f"bench|{sf_dir}"
        )
        build_secs[label] = round(time.time() - t0, 3)

    # one warm pass each (plan compile + catalog), then interleaved timing
    for label in CORPORA:
        probe_dedup_index(spark, dbs[label], increment).collect()
    probe_secs = {label: float("inf") for label in CORPORA}
    for _ in range(RUNS):
        for label in CORPORA:
            t0 = time.time()
            probe_dedup_index(spark, dbs[label], increment).collect()
            probe_secs[label] = min(probe_secs[label], time.time() - t0)

    out = {
        "metric": "incremental_dedup_indexed_flat_cost",
        "increment_docs": increment.count(),
        "corpus_docs": corpus_docs,
        "index_build_sec": build_secs,
        "probe_sec": {k: round(v, 3) for k, v in probe_secs.items()},
        "probe_ratio_10x_corpus": round(probe_secs["sf1"] / probe_secs["sf0.1"], 2),
        **(
            {"probe_ratio_100x_corpus": round(probe_secs["sf10"] / probe_secs["sf0.1"], 2)}
            if "sf10" in probe_secs
            else {}
        ),
        "runs": RUNS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
