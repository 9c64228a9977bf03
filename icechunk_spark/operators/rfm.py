"""RFM customer segmentation (SURVEY.md §2b extension): the classic
recency/frequency/monetary quartile segmentation over orders — the
cohorting step an analytics pipeline runs before targeting or churn
models.  Emits one row per (r_quartile, f_quartile, m_quartile)
segment with its customer count and average monetary value.

Determinism contract (cross-engine): every metric is an INTEGER —
recency = epoch days of the customer's latest order, frequency =
order count, monetary = lifetime cents — and each quartile cut is the
exact nearest-rank percentile read off the per-(metric-value) COUNT
frame (the winsorize pattern: a window over the grouped frame, which
is value-domain-sized, never a global sort of raw customers — the
documented parallelism-collapse escape).  Assignment is pure
comparison against the three cuts: q = 1 + (v > c25) + (v > c50) +
(v > c75), so both engines agree bit-for-bit.  avg_monetary_dollars
uses the integer HALF_UP division idiom.

Scale shape: one groupBy(custkey) over orders (map-side combined),
three tiny cut computations over value-count frames, one broadcast of
the 9 cut values (via cross-join of a 1-row frame), one final
segment groupBy — no window over raw customers, no driver state
beyond the cuts row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

RFM_PCTS = (25, 50, 75)


def _cuts(per_value: DataFrame, col: str) -> DataFrame:
    """Exact nearest-rank p25/p50/p75 of ``col`` off its (value, cnt)
    frame: cumulative window over the grouped frame only."""
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    cum = per_value.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        per_value.agg(F.sum("cnt").cast("bigint").alias("n"))
    )
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.expr(f"({p} * n + 99) div 100"), F.col(col))
        ).alias(f"{col}_p{p}")
        for p in RFM_PCTS
    ]
    return cum.agg(*aggs)


def _quartile(v: Column, cuts: list[Column]) -> Column:
    q = F.lit(1)
    for c in cuts:
        q = q + (v > c).cast("int")
    return q


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("recency"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary"),
    )
    cuts = None
    for m in ("recency", "frequency", "monetary"):
        pv = per_cust.groupBy(m).agg(F.count(F.lit(1)).alias("cnt"))
        c = _cuts(pv, m)
        cuts = c if cuts is None else cuts.crossJoin(c)
    seg = per_cust.crossJoin(F.broadcast(cuts)).select(
        _quartile(
            F.col("recency"), [F.col(f"recency_p{p}") for p in RFM_PCTS]
        ).alias("r_quartile"),
        _quartile(
            F.col("frequency"), [F.col(f"frequency_p{p}") for p in RFM_PCTS]
        ).alias("f_quartile"),
        _quartile(
            F.col("monetary"), [F.col(f"monetary_p{p}") for p in RFM_PCTS]
        ).alias("m_quartile"),
        "monetary",
    )
    return (
        seg.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monetary").cast("bigint").alias("msum"),
        )
        .select(
            "r_quartile",
            "f_quartile",
            "m_quartile",
            "n_customers",
            # cents -> dollars at 4dp, integer HALF_UP on the cent sum
            (
                F.expr("(20000 * msum + 100 * n_customers) div (200 * n_customers)")
                / 10000.0
            ).alias("avg_monetary_dollars"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


def _rfm_sql() -> str:
    cut_cols = ",\n    ".join(
        f"(SELECT min(v) FROM ("
        f"SELECT {m} AS v, sum(count(*)) OVER (ORDER BY {m}) AS cum, "
        f"(SELECT count(*) FROM per_cust) AS n "
        f"FROM per_cust GROUP BY {m}) "
        f"WHERE cum >= ({p} * n + 99) // 100) AS {m}_p{p}"
        for m in ("recency", "frequency", "monetary")
        for p in RFM_PCTS
    )
    q = {
        m: " + ".join(
            ["1"] + [f"CASE WHEN {m} > {m}_p{p} THEN 1 ELSE 0 END" for p in RFM_PCTS]
        )
        for m in ("recency", "frequency", "monetary")
    }
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(datediff('day', DATE '1970-01-01', CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS recency,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary
  FROM orders GROUP BY o_custkey
), cuts AS (
  SELECT {cut_cols}
), seg AS (
  SELECT {q["recency"]} AS r_quartile,
         {q["frequency"]} AS f_quartile,
         {q["monetary"]} AS m_quartile,
         monetary
  FROM per_cust, cuts
)
SELECT r_quartile, f_quartile, m_quartile,
       CAST(count(*) AS BIGINT) AS n_customers,
       ((20000 * CAST(sum(monetary) AS BIGINT) + 100 * count(*))
          // (200 * count(*))) / 10000.0 AS avg_monetary_dollars
FROM seg
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


RFM_SQL = _rfm_sql()

QUERIES = {"rfm_segments": rfm_segments}
ORACLES = {"rfm_segments": RFM_SQL}
