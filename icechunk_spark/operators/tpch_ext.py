"""Remaining TPC-H-style analytics (q2/q8/q11/q13/q15/q16/q17/q20/
q21/q22), adapted to the driver schema: there is no partsupp table, so
part↔supplier relationships derive from distinct (l_partkey,
l_suppkey) pairs in lineitem, and q21's late-delivery predicate is
re-expressed over l_returnflag (no commit/receipt dates).

Scale notes (100 TB):
- The part↔supplier pair extraction is a single distinct over two
  int columns — a narrow shuffle that Catalyst collapses into the
  downstream aggregate where possible.
- Scalar thresholds (q11 total, q15 max, q22 avg) are computed as
  1-row aggregates and cross-joined; Spark broadcasts the 1-row side
  so no fact shuffle is added.
- All dimension joins broadcast; window functions partition on the
  high-cardinality key (p_partkey / s_suppkey) so no skew.

Every query has a DuckDB oracle keyed by the same name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from icechunk_spark.catalog import load_tables
from icechunk_spark.functions import money_sum


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small ECONOMY part, the best (max-acctbal) ASIA supplier
    that has actually shipped it.  partsupp ≡ distinct lineitem pairs."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].filter(
        (F.col("p_size").between(1, 15)) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_name")
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    asia_supp = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM pairs
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size BETWEEN 1 AND 15 AND p_type = 'ECONOMY' AND r_name = 'ASIA'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of ECONOMY-part revenue sold to ASIA
    customers, by order year."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_cust = (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .withColumn("volume", rev)
    )
    vol_dec = F.col("volume").cast("decimal(18,6)")
    return (
        df.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol_dec).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.sum(vol_dec).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from NATION_3 suppliers exceeds 0.1% of
    that nation's total shipped value.  Threshold is a 1-row aggregate
    cross-joined (broadcast) — no extra fact shuffle."""
    t = load_tables(spark, sf_dir)
    n3_supp = (
        t["supplier"]
        .join(
            broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)")
    ).alias("value")
    by_part = (
        t["lineitem"]
        .join(broadcast(n3_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(value)
    )
    total = by_part.agg(F.sum("value").alias("total"))
    return (
        by_part.crossJoin(broadcast(total))
        .filter(F.col("value") > F.col("total") / 1000)
        .select("l_partkey", F.round("value", 2).cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


Q11_SQL = """
WITH by_part AS (
  SELECT l_partkey, sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
FROM by_part
WHERE value > (SELECT sum(value) / 1000 FROM by_part)
ORDER BY part_value DESC, l_partkey ASC
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (non-urgent orders),
    including zero-order customers via left outer join."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max revenue in 1996Q1; the max is a broadcast
    1-row aggregate, not a second scan of lineitem."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) for non-promo,
    non-Brand#1 parts of selected sizes.  partsupp ≡ lineitem pairs."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20%
    of the part's mean quantity) stopped.  Per-part mean is a groupBy
    over lineitem joined back — partial agg + one shuffle on partkey."""
    t = load_tables(spark, sf_dir)
    brand = t["part"].filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    avg_qty = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    )
    return (
        t["lineitem"]
        .join(brand, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty.withColumnRenamed("l_partkey", "t_partkey"),
              F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2' AND p_type = 'MEDIUM'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped > 50 units of widget parts during 1996 —
    semi-join of supplier against a HAVING aggregate."""
    t = load_tables(spark, sf_dir)
    widgets = t["part"].filter(F.col("p_name").contains("widget")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(widgets, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returns on finished multi-
    supplier orders: their line has l_returnflag='R', some other
    supplier participated, and no other supplier's line was returned.
    (Adaptation: the reference predicate uses receipt/commit dates the
    driver schema lacks; returnflag is the failure signal here.)"""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).distinct()
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey"))
        .distinct()
    )
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_fault = exists_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_fault.join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
                                 FROM lineitem WHERE l_returnflag = 'R') l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy-but-inactive customers per country code (nationkey % 5):
    above-average positive balance, no in-progress ('P') orders
    (anti-join; every customer here has *some* order, so the reference's
    no-orders-at-all predicate would be vacuous)."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        t["customer"]
        .crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("int"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_cnt": q16_part_supplier_cnt,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_global_sales": q22_global_sales,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_order_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_part_supplier_cnt": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_global_sales": Q22_SQL,
}
