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
    for name in ("tpch_ext", "analytics_ext", "windows", "dedup", "similarity", "textstats", "textquality", "pipeline_ext", "corpus_ext", "training_ext", "profile_ext", "curation_ext", "multimodal", "repo_queries", "streaming_queries"):
        try:
            mods.append(__import__(f"icechunk_spark.operators.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


# Explicit iteration-order priority: the driver correctness gate checks
# the FIRST 50 entries of ``all_queries()``.  History: r1/r2 checked the
# TPC-H/analytics/dedup block, r3 rotated in the similarity/text/
# multimodal/repo/streaming block, r4 re-verified the 10 never-green
# fixes + the 33 stalest r1/r2 greens (50/50 green), r5 re-verified the
# 44 stale r2/r3 greens + bpe_pair_counts + the 4 new training ops
# (50/50 green), r6 re-verified the 10 late-r5 queries + 38 r4 greens +
# its 6 new ops (50/50 green).  Round 7 window = 2 anchors + the 16
# remaining r4 greens (the overflow head the r6 comment promised) + the
# new r7 queries (new queries always land inside the window) + the 30
# stalest r5 greens.  The 18 remaining r5 greens head the overflow for
# r8, followed by the r6/r7 greens.
PRIORITY: list[str] = [
    # anchors (continuity across every round)
    "q1_pricing_summary",
    "minhash_lsh",
    # r4 greens, now 3 windows old — the r7 must-check block
    "ngram_jaccard",
    "sessionize",
    "asof_join",
    "range_join",
    "pivot_events",
    "window_lead_lag",
    "topk_per_group",
    "running_agg",
    "distinct_count_exact",
    "distinct_count_approx",
    "percentiles",
    "rollup_cube",
    "json_extract_agg",
    "pack_sequences",
    "mixture_sample",
    "word_entropy",
    # NEW in r7: first driver row immediately
    "array_store_roundtrip_distributed",
    "repo_cdc_changes",
    "dsir_importance",
    "ccnet_perplexity_buckets",
    # stalest r5 greens (checked r5, skipped r6)
    "bpe_pair_counts",
    "rank_distribution",
    "first_last_in_group",
    "stats_agg",
    "string_agg_ordered",
    "histogram_value",
    "time_resample",
    "customer_retention_setops",
    "sketch_event_counts",
    "hypertable_rollup",
    "dedup_exact_keep_first",
    "embedding_neardup",
    "cross_doc_spans",
    "knn_brute_force",
    "pairwise_topk",
    "label_centroids",
    "vector_norm_stats",
    "kmeans_clusters",
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
    # ---- window boundary (50) ----
    # overflow head = remaining r5 greens; r8's window starts here
    "decontaminate",
    "stratified_sample",
    "bigram_logprob_score",
    "source_vocab_overlap",
    "length_percentile_filter",
    "vector_quantize_error",
    "shard_assign",
    "multimodal_features",
    "media_dedup",
    "frame_sample",
    "media_resize",
    "array_store_roundtrip",
    "repo_time_travel",
    "repo_changed_cells",
    "stream_running_totals",
    "stream_static_enrich",
    "ttr_stats",
    "zipf_slope",
    "funnel_conversion",
    "label_pair_similarity",
    # r6 greens follow (freshest full block — checked last round)
    "pmi_phrases",
    "event_interarrival_stats",
    "cluster_size_distribution",
    "split_leakage_rate",
    "embedding_outliers",
    "event_type_markov",
    "session_paths",
    "source_kl_divergence",
    "vocab_coverage",
    "lsh_quality",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_class",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "knn_lsh",
    "knn_ivf",
    "stream_windowed_agg",
    "stream_dedup",
    "stream_interval_join",
    "stream_sessionize",
    "repo_manifest_stats",
    "dedup_cluster",
    "dedup_cluster_star",
    "dedup_exact",
    "simhash",
    "winnowing_fingerprint",
    "source_mixture_weights",
    "doc_token_histogram",
    "retention_cohorts",
    "embedding_covariance",
    "stream_topk_users",
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
