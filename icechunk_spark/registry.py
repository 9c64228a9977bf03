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
    for name in ("tpch_ext", "analytics_ext", "windows", "dedup", "similarity", "semdedup", "linedup", "refine_ext", "sampling_ext", "pii", "bucketed", "curate_pipeline", "anomaly_ext", "textstats", "textquality", "pipeline_ext", "corpus_ext", "training_ext", "profile_ext", "curation_ext", "multimodal", "repo_queries", "streaming_queries"):
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
# stalest r5 greens.  Round 8 window (final) = 2 anchors + 17
# new-in-r8 queries (semdedup, 5 linedup, 4 refine_ext + fps_sample,
# weighted_sample, ngram_diversity, pii_stats, pii_redact,
# q3_bucketed, curate_select) + ALL 20 remaining r5 greens + 5
# changed-module r6 rows + q3/q4/q5/q7 + knn_brute_force + q9.
# After r8 no green row is older than r6; the r9 overflow head =
# the 6 swapped-out changed-module rows (winnowing_fingerprint ..
# simhash), then the r8-changed tpch/similarity block, the clean r6
# block, and the 4 latest additions (q5/q9_bucketed,
# rolling_zscore_anomalies, value_drift_psi) — every swapped or
# overflow row re-gated green locally this round (per-entry notes
# below).
PRIORITY: list[str] = [
    # anchors (continuity across every round)
    "q1_pricing_summary",
    "minhash_lsh",
    # NEW in r8: first driver row immediately
    "semdedup",
    "line_dedup",
    "ngram_containment",
    "idf_doc_score",
    "length_mad_outliers",
    "dedup_cascade",
    # NEW late-r8 (refine_ext.py): first driver row immediately.  Their
    # 4 window slots come from the stalest-clean-r6 block below —
    # pmi_phrases/event_interarrival_stats/cluster_size_distribution/
    # split_leakage_rate move to the r9 overflow head (all 4 re-gated
    # green via tools/check.py when these slots were taken)
    "clean_reassemble",
    "quality_quantile_norm",
    "event_decay_score",
    "mmr_diversify",
    # fps_sample's slot comes from q6_forecast_revenue (tpch.py already
    # has its changed-module block heading the r9 overflow; q6 re-gated
    # green locally and joins it)
    "fps_sample",
    # NEW latest-r8 (sampling_ext.py / pii.py / bucketed.py): first
    # driver row immediately.  Their 5 slots come from the 5
    # curation_ext.py changed-module rows below (winnowing_fingerprint,
    # source_mixture_weights, doc_token_histogram, retention_cohorts,
    # embedding_covariance) — all 5 re-gated green via tools/check.py
    # at sf0.01 before bumping; they head the r9 overflow and stay
    # listed by check.py --stale until their r9 driver row.
    "weighted_sample",
    "ngram_diversity",
    "pii_stats",
    "pii_redact",
    "q3_bucketed",
    # NEW latest-r8 capstone (curate_pipeline.py): dedup→quality→
    # decontaminate→weighted-select in one plan; its slot comes from
    # simhash (dedup.py changed-module row, re-gated green locally
    # this round — joins the r9 overflow head)
    "curate_select",
    # the 20 r5-stale greens (VERDICT r7 #2: retire every r5 row)
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
    # r6 greens whose defining module changed since their row
    # (tools/check.py --stale flags these CHANGED)
    "lsh_quality",
    "repo_manifest_stats",
    "dedup_cluster",
    "dedup_cluster_star",
    "dedup_exact",
    # stalest remaining r6 greens (module-clean, freshness rotation)
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    # r8 code changes: knn norm-precompute (similarity.py) and the
    # q3/q5 selectivity-first restructure (tpch.py) — changed-module
    # rows refresh in the same round the code changed
    "knn_brute_force",
    "q9_product_profit",
    # ---- window boundary (50) ----
    # r9 overflow head.  FIRST the 5 curation_ext.py changed-module r6
    # rows bumped when the 5 latest-r8 sampling/pii/bucketed queries
    # took their window slots (all 5 re-gated green via tools/check.py
    # at sf0.01 this round; check.py --stale lists them until r9):
    "winnowing_fingerprint",
    "source_mixture_weights",
    "doc_token_histogram",
    "retention_cohorts",
    "embedding_covariance",
    # simhash's slot went to the curate_select capstone (dedup.py
    # changed-module row, re-gated green locally this round):
    "simhash",
    # then the 4 module-clean r6 greens bumped when
    # the 4 late-r8 refine_ext queries took their window slots (all 4
    # re-gated green via tools/check.py this round):
    "pmi_phrases",
    "event_interarrival_stats",
    "cluster_size_distribution",
    "split_leakage_rate",
    # then the 5 module-clean r6 greens bumped when the 5 late-r8
    # linedup queries took their slots (re-gated green locally):
    "event_type_markov",
    "session_paths",
    "source_kl_divergence",
    "vocab_coverage",
    "embedding_outliers",
    # then the 11 queries whose modules (tpch.py, similarity.py)
    # changed in r8 but did not fit the window — all 11 re-gated green
    # via tools/check.py this round; their driver rows refresh in r9
    # (check.py --stale lists them until then):
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
    # then the module-clean remaining r6 greens
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
    # latest-r8 bucketed variants (q3_bucketed is in-window; these two
    # share its machinery and oracle pattern — gated green locally,
    # first driver row whenever the rotation reaches them)
    "q5_bucketed",
    "q9_bucketed",
    # latest-r8 anomaly/drift pair (anomaly_ext.py) — gated green
    # locally at sf0.001 and sf0.01; first driver rows in r9
    "rolling_zscore_anomalies",
    "value_drift_psi",
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
