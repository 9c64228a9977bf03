"""Central registry: collects QUERIES/ORACLES from every operator
module.  ``__spark_entry__.queries()`` / ``oracle_sql()`` delegate here.

A query with no oracle entry gets the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops — LSH/ANN internals,
streaming, repo version-control operations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from icechunk_spark.operators import tpch

    mods = [tpch]
    for name in ("tpch_ext", "analytics_ext", "windows", "dedup", "similarity", "textstats", "textquality", "pipeline_ext", "corpus_ext", "multimodal", "repo_queries", "streaming_queries"):
        try:
            mods.append(__import__(f"icechunk_spark.operators.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


# Explicit iteration-order priority: the driver correctness gate checks
# the FIRST 50 entries of ``all_queries()``.  Round 1-2 checked the 50
# TPC-H/analytics/dedup queries (49 green twice); round 3 rotates the 43
# never-checked operators (similarity, text, multimodal, streaming, repo)
# into the window, keeping 7 well-established anchors for continuity —
# including ``sessionize``, whose timestamp_ntz fix needs driver
# re-verification.  Queries not listed here follow in module order.
PRIORITY: list[str] = [
    # anchors (driver-green in r01+r02; sessionize fixed this round)
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "sessionize",
    "minhash_lsh",
    "dedup_cluster",
    "dedup_exact",
    "simhash",
    # §2c/§2d similarity + near-dup — never driver-checked before r3
    "embedding_neardup",
    "cross_doc_spans",
    "knn_brute_force",
    "pairwise_topk",
    "knn_lsh",
    "knn_ivf",
    "label_centroids",
    "vector_norm_stats",
    "kmeans_clusters",
    # §2e text analysis / LLM pipeline
    "lang_id",
    "token_count",
    "quality_score",
    "fingerprint",
    "ngram_freq",
    "pipeline_clean_corpus",
    "dup_span_fraction",
    "gopher_quality_filters",
    "tfidf_top_terms",
    "split_train_val",
    "pack_sequences",
    "mixture_sample",
    "decontaminate",
    "stratified_sample",
    "bigram_logprob_score",
    "source_vocab_overlap",
    "length_percentile_filter",
    "word_entropy",
    "vector_quantize_error",
    "shard_assign",
    # §2f multimodal
    "multimodal_features",
    "media_dedup",
    "frame_sample",
    "media_resize",
    # §2a repo / version-control queries
    "array_store_roundtrip",
    "repo_time_travel",
    "repo_manifest_stats",
    "repo_changed_cells",
    # §2g streaming
    "stream_windowed_agg",
    "stream_dedup",
    "stream_sessionize",
    "stream_running_totals",
    "stream_interval_join",
    "stream_static_enrich",
]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        merged.update(getattr(mod, "QUERIES", {}))
    out: dict[str, QueryFn] = {}
    for name in PRIORITY:
        if name in merged:
            out[name] = merged[name]
    for name, fn in merged.items():
        if name not in out:
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
