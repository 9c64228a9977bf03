"""Core analytics operators: scan / filter / aggregate / join plans in
the TPC-H style, adapted to the driver's schemas (SURVEY.md §2b).

Scale notes (100 TB):
- Dimension tables (region, nation, supplier, part at these ratios)
  are broadcast — no shuffle of the fact side for those joins.
- Aggregations are expressed as groupBy().agg() so Catalyst emits
  partial (map-side) aggregation before the shuffle.
- Filters are plain column predicates on parquet scan leaves →
  predicate pushdown + column pruning (verified in tests).
- Every computed column is aliased identically to its oracle-SQL
  counterpart, and doubles are rounded to stabilize cross-engine
  value hashing.

Each query has a matching DuckDB oracle in ORACLES keyed by the same
name.  Reference parity: icechunk is a storage engine; this module is
the analytics surface a Spark user runs over data stored in it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_avg, money_sum
from icechunk_spark.functions.bucketing import table_bytes

#: SHUFFLE_HASH-hint gate for the q3/q5/q9 fact⋈fact joins.  After the
#: orderkey exchange, a hash join skips the two sorts SMJ pays —
#: measured ~30% on raw q3 at sf10 (2.4-2.6 s vs 3.5-3.7 s, identical
#: values; same per-join-hint lesson as the bucketed variants).  But a
#: SHJ build is an in-memory map of one shuffle partition with no sort
#: fallback, so an unbounded hint is an executor-OOM risk at extreme
#: SF: gate on orders' on-disk bytes (64 GiB ≈ sf300; the filtered
#: per-partition build there is still ~100 MB at 32+ partitions, and
#: past the cap the hint drops and the planner keeps SMJ).  At true
#: 100 TB the bucketed variants are the answer anyway.
SHJ_SRC_CAP_BYTES = 64 << 30


def _maybe_shj(df: DataFrame, sf_dir: str, table: str = "orders") -> DataFrame:
    if table_bytes(sf_dir, table) <= SHJ_SRC_CAP_BYTES:
        return df.hint("shuffle_hash")
    return df


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: full-scan groupBy with map-side combine."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            money_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10.  No forced broadcast:
    customer scales with SF (~20 GB at sf100) and a hint overrides the
    size threshold — AQE broadcasts it at small SF and shuffles at
    large SF, which is the right call both times."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz"))
    # selectivity-first join order (what CBO would pick with stats):
    # the BUILDING semi-filter shrinks orders ~5x BEFORE the big
    # lineitem join, so the join's probe stream and the downstream agg
    # see 1/5 the rows — measured tighter tails at sf10 (3.0-3.5s vs
    # 3.1-8.1s) with identical values
    ob = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz"))
    return (
        li.join(_maybe_shj(ob, sf_dir), li.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: orders with any returned lineitem, by priority."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join, restructured selectivity-first (r8): region→nation→
    customer→orders reduce FIRST (ASIA customers are ~1/5, one order
    year ~1/7 — the orders side shrinks ~35x to `ob` BEFORE lineitem
    joins it), so the only big-table join probes a small build side.
    No forced broadcast on `ob`: its size scales with SF, and AQE's
    runtime-measured conversion broadcasts it exactly when it fits
    (at sf10 it does — measured 2.3-2.9s vs 3.4-5.5s for the
    join-late shape, identical values; a forced hint reaches 1.1s but
    would OOM a driver at sf1000, the wrong trade for the 100TB
    target)."""
    t = load_tables(spark, sf_dir)
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    nat = t["nation"].join(broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    cust = t["customer"].join(broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # no hint on cust either — it scales with SF like orders; the
    # size-threshold planner broadcasts it for as long as it fits
    ob = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey", "n_name"
    )
    return (
        t["lineitem"]
        .join(_maybe_shj(ob, sf_dir), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan + filter + global agg; every predicate pushes to parquet."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair shipping volume by year; broadcast both nation maps."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    df = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")
                | (F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9")
            )
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
    )
    return (
        df.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join profit by nation/year (retailprice as cost proxy —
    the driver schema has no partsupp table)."""
    t = load_tables(spark, sf_dir)
    green = t["part"].filter(F.col("p_name").contains("e")).select("p_partkey", "p_retailprice")
    df = (
        t["lineitem"]
        .join(green, F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            _maybe_shj(t["orders"], sf_dir),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .withColumn(
            "amount",
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity") * 0.1,
        )
    )
    return (
        df.groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(money_sum("amount").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%e%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer, deterministic top-20."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (high/low priority line counts)."""
    t = load_tables(spark, sf_dir)
    df = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        df.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional ratio aggregate (promo revenue share)."""
    t = load_tables(spark, sf_dir)
    df = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return df.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-HAVING on the fact table, then join back to headers."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(money_sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-predicate join (brand × size × quantity bands)."""
    t = load_tables(spark, sf_dir)
    df = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 21)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(5, 35)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity").between(10, 50)))
    )
    return df.filter(cond).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 10 AND 50)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q12_priority_class": q12_priority_class,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_revenue": q19_discounted_revenue,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q4_order_priority": Q4_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q9_product_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_class": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
}
