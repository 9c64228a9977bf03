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
# the FIRST 50 entries of ``all_queries()``.  History: r1/r2 checked the
# TPC-H/analytics/dedup block, r3 rotated in the similarity/text/
# multimodal/repo/streaming block.  Round 4 window = 7 anchors + the 10
# queries that were never driver-green (all root-caused and fixed this
# round: streaming ts decode, HUGEINT oracle casts, new knn_lsh/knn_ivf
# oracles) + the 33 stalest r1/r2-only greens (2 rounds unchecked).
# Queries not listed here follow in module order (all driver-green in
# r3, so at most 1 round stale).
PRIORITY: list[str] = [
    # anchors (continuity across every round)
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "sessionize",
    "minhash_lsh",
    "dedup_cluster",
    "dedup_exact",
    "simhash",
    # never driver-green before this round — fixed in r4, verify first
    "pack_sequences",
    "mixture_sample",
    "word_entropy",
    "knn_lsh",
    "knn_ivf",
    "stream_windowed_agg",
    "stream_dedup",
    "stream_interval_join",
    "stream_sessionize",
    "repo_manifest_stats",
    # TPC-H block: green in r1/r2, unchecked for 2 rounds
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
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
    # windows/analytics + dedup variants: green in r2, 2 rounds stale
    "topk_per_group",
    "running_agg",
    "distinct_count_exact",
    "distinct_count_approx",
    "percentiles",
    "rollup_cube",
    "asof_join",
    "range_join",
    "pivot_events",
    "json_extract_agg",
    "window_lead_lag",
    "ngram_jaccard",
    "dedup_cluster_star",
    # ---- window boundary (50) ----
    # next-stalest r2 greens lead the overflow so r5's rotation is easy
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
