"""Table profiling (SURVEY.md §2b extension): the data-quality census
a pipeline runs on every new snapshot of a table before trusting it —
per column: row count, null count, exact distinct count, lexical
min/max (values rendered as strings so one schema fits every column
type), and average rendered length.

Scale shape: ONE aggregation pass over the table computes every
per-column statistic (count/nulls/min/max/len are plain map-side-
combined aggregates; the exact multi-column count_distincts share the
pass through Spark's multi-distinct rewrite — the documented
×n_columns price of exactness; a 100 TB profile would swap in
approx_count_distinct and lose the multiplier).  The 1-row aggregate
result is collected and unpivoted DRIVER-SIDE into (column, stats)
rows (local_df — no job): a lazy per-column union of selects over the
aggregate frame re-plans the whole corpus aggregation once per
column (measured: 4 columns -> 8 FileScans), which is exactly the
multi-scan trap this operator exists to avoid.

Determinism: min/max/avg-length are computed on CAST(col AS STRING)
(DuckDB: CAST AS VARCHAR) so both engines order values identically;
doubles are excluded from the profiled set (their string renderings
differ across engines); avg_len uses the integer HALF_UP idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables
from icechunk_spark.engine import local_df

#: orders columns profiled — every non-double, non-timestamp column
#: (doubles and timestamps render differently across engines)
PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
)


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    one = profile_agg_frame(orders)
    r = one.collect()[0]  # the single corpus pass
    n = int(r["__n"])
    recs = [
        {
            "col_name": c,
            "n_rows": n,
            "n_null": int(r[f"{c}__nulls"]),
            "n_distinct": int(r[f"{c}__distinct"]),
            "min_value": r[f"{c}__min"],
            "max_value": r[f"{c}__max"],
            # integer HALF_UP 4dp mean length
            "avg_len": ((20000 * int(r[f"{c}__lensum"]) + n) // (2 * n)) / 10000.0,
        }
        for c in PROFILE_COLS
    ]
    return local_df(
        spark,
        recs,
        "col_name string, n_rows bigint, n_null bigint, n_distinct bigint, "
        "min_value string, max_value string, avg_len double",
    ).orderBy("col_name")


def profile_agg_frame(orders: DataFrame) -> DataFrame:
    """The single-pass 1-row aggregate every statistic reads from —
    exposed so tests can pin its plan (one FileScan)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in PROFILE_COLS:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(c).cast("bigint").alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.sum(F.length(s).cast("bigint")).cast("bigint").alias(f"{c}__lensum"),
        ]
    return orders.agg(*aggs)


def _profile_sql() -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_value,
       max(CAST({c} AS VARCHAR)) AS max_value,
       ((20000 * CAST(sum(length(CAST({c} AS VARCHAR))) AS BIGINT) + count(*))
          // (2 * count(*))) / 10000.0 AS avg_len
FROM orders""")
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


PROFILE_SQL = _profile_sql()

QUERIES = {"profile_table": profile_table}
ORACLES = {"profile_table": PROFILE_SQL}
