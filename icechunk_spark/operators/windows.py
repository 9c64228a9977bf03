"""Window / ordered-analytics operators (SURVEY.md §2b, second half):
top-k per group, running aggregates, percentiles, rollup, as-of join,
range (interval) join, gap-based sessionization, pivot.

Scale notes:
- Window partitions are keyed on high-cardinality business keys
  (customer, user) so state per partition stays small; no global
  windows without a partition key.
- The as-of join is the union-sort-window pattern: one shuffle on the
  join key, linear scan per key — the classic distributed point-in-time
  join (no per-row subqueries).
- The range join buckets time into fixed intervals and joins on
  (key, bucket ∈ {b, b+1}) before the precise predicate — candidate
  pairs stay O(events·2) instead of O(n²) per key.
- Explicit ROWS frames everywhere: Spark's default RANGE frame differs
  from other engines when sort keys tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_sum


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price per market segment (window rank)."""
    t = load_tables(spark, sf_dir)
    df = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rnk")
    )


TOPK_SQL = """
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey) x
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend + 3-order moving average."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return (
        t["orders"]
        .withColumn(
            "running_spend",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w), 2).cast("double"),
        )
        .withColumn(
            "moving_avg_3",
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w3).cast("double")
                / F.count(F.lit(1)).over(w3),
                4,
            ),
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "running_spend", "moving_avg_3")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def distinct_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (two distinct aggs → expand)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def distinct_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct with an ORACLE-CHECKABLE error bound:
    the sketch value itself is engine-specific, so the query emits the
    exact count plus a boolean asserting |approx - exact| / exact <=
    5% (2.5x the configured 2% rsd).  The DuckDB oracle produces the
    same exact counts with within_bound = TRUE, so the driver's hash
    compare fails iff the HLL estimate ever drifts out of bounds."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts_exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        )
        .select(
            "l_returnflag",
            "n_parts_exact",
            (
                F.abs(F.col("approx") - F.col("n_parts_exact"))
                <= F.col("n_parts_exact") * 0.05
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_APPROX_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts_exact,
       TRUE AS within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# Two-phase dispatch: below this (footer row count) the single
# percentile() aggregate wins — its whole cost is one pass + one
# per-group map merge, and the two-phase form pays ~4 extra exchanges
# of fixed cost.  Above it the per-group value-count maps become the
# bottleneck: the final merge deserializes every partial map into
# n_groups tasks (3 here), memory grows with DISTINCT values per
# group, and the two-phase form's window only ever sees distinct
# values.  Measured ladder (interleaved min-of-3 per point): 600 k
# rows agg 1.6-2.1 s vs twophase 2.2-2.9 s; 6 M agg wins 3.7 vs
# 4.4 s; 18 M twophase wins 3.6 vs 4.9 s; 60 M twophase wins 4.7 vs
# 8.8 s (1.9x, growing with volume) — the crossover sits in 6-18 M.
PCTL_TWOPHASE_MIN_ROWS = 8_000_000


def _group_percentiles(df, key: str, col: str, ps, names) -> DataFrame:
    """Per-key exact interpolated percentiles, two-phase: (key, value)
    counts (codegen HashAggregate, map-side combine), cumulative +
    total windows over the DISTINCT values only, then a per-key
    aggregate picks the covering rows for each index and interpolates
    with Spark's own weighted form (kh-pos)·lo + (pos-kl)·hi — the
    empirically bit-exact percentile() arithmetic (60/60 random
    bitwise trials; the lower+frac form differs in 19/60).  Exactly
    one distinct-value row covers each 0-based index [cum-cnt, cum),
    so the max() aggregates are pure row-picks."""
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(key, col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(key)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    cum = counts.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    aggs = [F.max("n").alias("n")]
    for p, nm in zip(ps, names):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        kl, kh = F.floor(pos), F.ceil(pos)

        def covers(k):
            return (F.col("cum") - F.col("cnt") <= k) & (k < F.col("cum"))

        cum = cum.withColumn(f"__lo_{nm}", F.when(covers(kl), F.col(col)))
        cum = cum.withColumn(f"__hi_{nm}", F.when(covers(kh), F.col(col)))
        aggs += [
            F.max(f"__lo_{nm}").alias(f"lo_{nm}"),
            F.max(f"__hi_{nm}").alias(f"hi_{nm}"),
        ]
    g = cum.groupBy(key).agg(*aggs)
    out = [F.col(key)]
    for p, nm in zip(ps, names):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        kl, kh = F.floor(pos), F.ceil(pos)
        out.append(
            F.when(kl == kh, F.col(f"lo_{nm}").cast("double"))
            .otherwise(
                (kh.cast("double") - pos) * F.col(f"lo_{nm}").cast("double")
                + (pos - kl.cast("double")) * F.col(f"hi_{nm}").cast("double")
            )
            .alias(nm)
        )
    return g.select(*out)


def _percentiles_agg(li: DataFrame) -> DataFrame:
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))").alias("pp"),
            F.expr("percentile(l_quantity, 0.25)").alias("pq"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("pp", 1), 4).alias("p50_price"),
            F.round(F.element_at("pp", 2), 4).alias("p90_price"),
            F.round("pq", 4).alias("p25_qty"),
        )
        .orderBy("l_returnflag")
    )


def _percentiles_twophase(li: DataFrame) -> DataFrame:
    price = _group_percentiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.9], ["p50_price", "p90_price"]
    )
    qty = _group_percentiles(li, "l_returnflag", "l_quantity", [0.25], ["p25_qty"])
    return (
        price.join(qty, "l_returnflag", "full")
        .select(
            "l_returnflag",
            F.round("p50_price", 4).alias("p50_price"),
            F.round("p90_price", 4).alias("p90_price"),
            F.round("p25_qty", 4).alias("p25_qty"),
        )
        .orderBy("l_returnflag")
    )


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based).

    r14: both price percentiles come from ONE percentile(col, array)
    aggregate — two scalar percentile aggs each built their own
    value-count map over the same column (the map build is the whole
    cost); the array form builds it once and interpolates both
    points from the same sorted counts, bit-identical (measured
    1.9 -> 1.3 s at sf0.1, equality pinned).

    r14 2nd pass: above PCTL_TWOPHASE_MIN_ROWS the per-group
    value-count maps (ObjectHashAggregate; the final merge
    deserializes every partial map into n_groups tasks) give way to
    the counts+window two-phase form — value-identical bit-for-bit
    (tests/test_percentiles_twophase.py)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    import pyarrow.parquet as pq

    from icechunk_spark.catalog import table_parquet_files

    try:
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in table_parquet_files(sf_dir, "lineitem")
        )
    except Exception:
        n = 0
    if n >= PCTL_TWOPHASE_MIN_ROWS:
        return _percentiles_twophase(li)
    return _percentiles_agg(li)


PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical region → nation rollup of customer balances."""
    t = load_tables(spark, sf_dir)
    df = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        df.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), money_sum("c_acctbal").alias("total_bal"))
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


ROLLUP_SQL = """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: for each event, the most recent order of the
    same customer at or before the event time.

    Distributed pattern: dedupe the right side to one row per
    (key, time), union both sides tagged, sort within key, carry the
    last seen order forward (single shuffle on the key)."""
    t = load_tables(spark, sf_dir)
    orders1 = (
        t["orders"]
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            "o_orderkey",
            F.lit(1).alias("is_order"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    events1 = t["events"].select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(0).alias("is_order"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("t"), F.desc("is_order"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = orders1.unionByName(events1).withColumn(
        "matched_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("ts"),
            "matched_orderkey",
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, o_orderdate)
SELECT event_id, user_id, ts, o.o_orderkey AS matched_orderkey
FROM events ASOF LEFT JOIN o
  ON events.user_id = o.o_custkey AND events.ts >= o.o_orderdate
ORDER BY event_id
"""


def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: pairs of events by the same user within
    5 minutes (strictly increasing ts, tiebreak event_id).

    Bucketed: candidates only from the same or adjacent 5-min bucket."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "event_id", "ts").withColumn(
        "bkt", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 300)
    )
    left = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("eid_a"),
        F.col("ts").alias("ts_a"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("jb"),
    )
    right = ev.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("eid_b"),
        F.col("ts").alias("ts_b"),
        F.col("bkt").alias("jb2"),
    )
    pairs = left.join(
        right,
        (F.col("u") == F.col("u2")) & (F.col("jb") == F.col("jb2")),
    ).filter(
        (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        pairs.groupBy(F.col("u").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy("user_id")
    )


RANGE_SQL = """
SELECT a.user_id AS user_id, count(*) AS pair_count
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id
ORDER BY user_id
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) per user."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        t["events"]
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess_seq",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        ev.groupBy("user_id", "sess_seq")
        .agg(
            F.min("ts").cast("timestamp_ntz").alias("session_start"),
            F.max("ts").cast("timestamp_ntz").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .orderBy("user_id", "sess_seq")
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  -- CAST: DuckDB types a bare SUM(BIGINT) as HUGEINT, which the
  -- driver materializes through pandas as float64 and hash-diverges
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
  FROM marked
)
SELECT user_id, sess_seq, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, sess_seq
ORDER BY user_id, sess_seq
"""


def rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions: percent_rank and cume_dist of
    each order's total within its priority class (sample: top-200 by
    key to keep the compare bounded)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


RANK_DIST_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
LIMIT 200
"""


def first_last_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an event-time frame: each user's
    first and most recent event type and value."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t["events"]
        .select(
            "user_id",
            F.first_value("event_type").over(w).alias("first_type"),
            F.last_value("event_type").over(w).alias("last_type"),
            F.round(F.first_value("value").over(w), 2).alias("first_value"),
            F.round(F.last_value("value").over(w), 2).alias("last_value"),
        )
        .distinct()
        .orderBy("user_id")
    )


FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       round(first_value(value) OVER w, 2) AS first_value,
       round(last_value(value) OVER w, 2) AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id
"""


def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull props.k out of the JSON payload
    column (JVM-side get_json_object — no Python) and aggregate it."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        t["events"]
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into one column per event type."""
    t = load_tables(spark, sf_dir)
    pv = (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(et), F.lit(0)).cast("bigint").alias(f"n_{et}") for et in EVENT_TYPES
    ]
    return pv.select(*cols).orderBy("user_id")


PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "topk_per_group": topk_per_group,
    "running_agg": running_agg,
    "distinct_count_exact": distinct_count_exact,
    "distinct_count_approx": distinct_count_approx,
    "percentiles": percentiles,
    "rollup_cube": rollup_cube,
    "asof_join": asof_join,
    "range_join": range_join,
    "sessionize": sessionize,
    "pivot_events": pivot_events,
    "json_extract_agg": json_extract_agg,
    "rank_distribution": rank_distribution,
    "first_last_in_group": first_last_in_group,
}

ORACLES = {
    "json_extract_agg": JSON_EXTRACT_SQL,
    "rank_distribution": RANK_DIST_SQL,
    "first_last_in_group": FIRST_LAST_SQL,
    "topk_per_group": TOPK_SQL,
    "running_agg": RUNNING_SQL,
    "distinct_count_exact": DISTINCT_SQL,
    "distinct_count_approx": DISTINCT_APPROX_SQL,
    "percentiles": PERCENTILES_SQL,
    "rollup_cube": ROLLUP_SQL,
    "asof_join": ASOF_SQL,
    "range_join": RANGE_SQL,
    "sessionize": SESSIONIZE_SQL,
    "pivot_events": PIVOT_SQL,
}
