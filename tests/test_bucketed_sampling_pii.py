"""Plan pins + contracts for the latest-r8 modules: bucketed
co-located joins (functions/bucketing.py, operators/bucketed.py),
weighted sampling / n-gram diversity (operators/sampling_ext.py),
and PII census/redaction (operators/pii.py)."""

from __future__ import annotations

from icechunk_spark.functions.bucketing import bucketed_db
from icechunk_spark.operators.bucketed import q3_bucketed
from icechunk_spark.operators.pii import pii_redact, pii_stats
from icechunk_spark.operators.sampling_ext import (
    SAMPLE_K,
    ngram_diversity,
    weighted_sample,
)
from icechunk_spark.operators.tpch import q3_shipping_priority

from .conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_db_is_idempotent(spark):
    db1 = bucketed_db(spark, SF_DIR)
    db2 = bucketed_db(spark, SF_DIR)
    assert db1 == db2
    assert spark.catalog.tableExists(f"{db1}.lineitem")
    assert spark.catalog.tableExists(f"{db1}.orders")


def test_q3_bucketed_zero_fact_shuffles(spark):
    """The whole point: lineitem ⋈ orders AND the (l_orderkey, …)
    aggregation reuse the written bucketing — the static plan has NO
    hash-partitioning exchange anywhere (the only exchange is the
    broadcast of the filtered customer dimension)."""
    bucketed_db(spark, SF_DIR)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(q3_bucketed(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert plan.count("SelectedBucketsCount") == 2, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_q3_bucketed_matches_raw_q3(spark):
    raw = q3_shipping_priority(spark, SF_DIR).collect()
    buck = q3_bucketed(spark, SF_DIR).collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in buck]


def test_weighted_sample_is_distributed_topk(spark):
    df = weighted_sample(spark, SF_DIR)
    plan = plan_of(df)
    # partial per-partition top-k merge, never a global sort+exchange
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    rows = df.collect()
    assert len(rows) == SAMPLE_K
    keys = [r.w_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(k < 0 for k in keys)  # ln(u)/w is strictly negative


def test_ngram_diversity_partial_agg_no_python(spark):
    df = ngram_diversity(spark, SF_DIR)
    df.collect()
    plan = plan_of(df)
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan
    rows = {(r.source, r.n): r for r in df.collect()}
    for (_, _), r in rows.items():
        assert 0 < r.diversity <= 1
        assert r.distinct_ngrams <= r.total_ngrams


def test_pii_paths_stay_jvm_side(spark):
    for fn in (pii_stats, pii_redact):
        plan = plan_of(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{fn.__name__} fell to Python rows"
        assert "PythonUDF" not in plan


def test_pii_redaction_removes_every_match(spark):
    import re

    from icechunk_spark.operators.pii import EMAIL_RE, IP_RE, PHONE_RE

    stats = pii_stats(spark, SF_DIR).collect()
    assert sum(r.n_emails for r in stats) > 0
    assert sum(r.n_phones for r in stats) > 0
    assert sum(r.n_ips for r in stats) > 0
    # redacted docs must contain no residual matches of any pattern
    red = pii_redact(spark, SF_DIR)
    assert red.filter(red.n_pii > 0).count() > 0
    # spot-verify the fingerprint contract: rebuild one redaction in
    # Python over the synthesized text and compare the md5
    from icechunk_spark.catalog import load_tables
    from icechunk_spark.operators.pii import _pii_text

    doc = (
        load_tables(spark, SF_DIR)["documents"]
        .filter("doc_id % 7 = 0")
        .select("doc_id", _pii_text().alias("pt"))
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    expected = re.sub(IP_RE, "<IP>", re.sub(PHONE_RE, "<PHONE>", re.sub(EMAIL_RE, "<EMAIL>", doc.pt)))
    import hashlib

    fp = red.filter(red.doc_id == doc.doc_id).collect()[0].redacted_fp
    assert fp == hashlib.md5(expected.encode()).hexdigest()


def test_curate_select_single_plan_shape(spark):
    """The capstone pipeline: broadcast decontamination join, no
    Python rows, distributed top-k — one declarative plan."""
    from icechunk_spark.operators.curate_pipeline import CURATE_K, curate_select

    df = curate_select(spark, SF_DIR)
    df.collect()
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Broadcast" in plan  # eval n-gram set broadcasts
    rows = df.collect()
    assert 0 < len(rows) <= CURATE_K
    # every survivor is train-side and its key is the A-ES key
    from icechunk_spark.operators.pipeline_ext import EVAL_MAX_ID

    assert all(r.doc_id >= EVAL_MAX_ID for r in rows)
    keys = [r.w_key for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_q5_q9_bucketed_fact_exchanges_bounded(spark):
    """q5_bucketed: both fact scans bucketed, and the ONLY
    hash-partitioning exchange is the 25-row n_name aggregate.
    q9_bucketed: at most two (part join + final aggregate) — never an
    orderkey exchange."""
    from icechunk_spark.operators.bucketed import q5_bucketed, q9_bucketed

    bucketed_db(spark, SF_DIR)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p5 = plan_of(q5_bucketed(spark, SF_DIR))
        p9 = plan_of(q9_bucketed(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    for name, plan in (("q5", p5), ("q9", p9)):
        assert plan.count("SelectedBucketsCount") == 2, name
        assert "hashpartitioning(l_orderkey" not in plan, name
        assert "hashpartitioning(o_orderkey" not in plan, name
    assert p5.count("Exchange hashpartitioning") == 1, p5
    assert p9.count("Exchange hashpartitioning") <= 2, p9


def test_anomaly_ops_plans_and_contracts(spark):
    from icechunk_spark.operators.anomaly_ext import (
        Z_MIN_N,
        rolling_zscore_anomalies,
        value_drift_psi,
    )

    zdf = rolling_zscore_anomalies(spark, SF_DIR)
    zdf.collect()
    plan = plan_of(zdf)
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan
    rows = zdf.collect()
    assert all(r.n_anomalies <= r.n_scored for r in rows)
    assert all(r.max_abs_z >= 0 for r in rows)

    pdf = value_drift_psi(spark, SF_DIR)
    pdf.collect()
    plan = plan_of(pdf)
    assert "BatchEvalPython" not in plan
    prows = pdf.collect()
    # PSI is a sum of (p2-p1)ln(p2/p1) terms, each individually >= 0
    assert all(r.psi >= 0 for r in prows)
    assert len(prows) == 5  # one per event_type


def test_events_value_is_cents_quantized(spark):
    """rolling_zscore_anomalies' integer-cents contract: every
    events.value is exactly a cent amount (if a future dataset breaks
    this, the operator must go back to DECIMAL sliding sums)."""
    from icechunk_spark.catalog import load_tables
    from pyspark.sql import functions as F

    ev = load_tables(spark, SF_DIR)["events"]
    off = ev.filter(
        F.abs(F.col("value") * 100 - F.round(F.col("value") * 100, 0)) > 1e-9
    ).count()
    assert off == 0


def test_suggest_buckets_scaling_rule():
    from icechunk_spark.functions.bucketing import TARGET_BUCKET_BYTES, suggest_buckets

    # sf10-sized fact (2.3 GB) stays at the parallelism floor
    assert suggest_buckets(2_300_000_000) == 32
    # a 1 TB fact: one bucket stays under the 128 MB target
    n = suggest_buckets(1_000_000_000_000)
    assert n == 8192 and 1_000_000_000_000 / n <= TARGET_BUCKET_BYTES
    # power-of-two, never below the floor
    assert suggest_buckets(0) == 32
    assert suggest_buckets(33 * TARGET_BUCKET_BYTES) == 64


def test_bucketed_db_auto_bucket_count(spark):
    from icechunk_spark.functions.bucketing import bucketed_db

    db = bucketed_db(spark, SF_DIR, buckets=None)  # tiny SF -> floor (32)
    # the auto database is distinct from the default-32 one only by
    # digest; the table must exist and answer queries
    assert spark.table(f"{db}.lineitem").count() > 0


def test_q3_partitioned_prunes_and_elides_in_one_plan(spark):
    """The composed 100 TB layout (VERDICT r9 #6): year-partition
    pruning AND bucketed exchange elision must coexist in ONE plan —
    the date predicates reach the scans as PartitionFilters while the
    fact join and aggregation reuse the written bucketing."""
    from icechunk_spark.operators.bucketed import q3_partitioned

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(q3_partitioned(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert "(l_year" in plan and " >= 1996)" in plan, plan
    assert "(o_year" in plan and " <= 1998)" in plan, plan
    assert plan.count("SelectedBucketsCount") == 2, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_q3_partitioned_matches_raw_q3(spark):
    from icechunk_spark.operators.bucketed import q3_partitioned

    raw = q3_shipping_priority(spark, SF_DIR).collect()
    part = q3_partitioned(spark, SF_DIR).collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in part]
