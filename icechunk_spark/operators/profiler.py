"""Table profiling (SURVEY.md §2b extension): the data-quality census
a pipeline runs on every new snapshot of a table before trusting it —
per column: row count, null count, exact distinct count, lexical
min/max (values rendered as strings so one schema fits every column
type), and average rendered length.

Scale shape — measured at sf10, the plan here is the fast one of
three candidates:
- ONE map-side-combined stats pass (count/nulls/min/max/len — all
  hash-aggregate friendly), plus
- ONE expand-based exact-distinct pass: explode each row into
  (col_idx, rendered value) pairs, two-stage groupBy — the first
  collapses to the distinct pairs (map-side combined), the second
  counts them per column.  Everything stays HashAggregate.
Folding the distincts into the stats pass instead triggers Spark's
multi-distinct rewrite, whose first()-wrapped companions degrade the
whole aggregate to a SortAggregate over the expanded rows — measured
10.4 s vs 1.4 s for this shape at sf10 (4 separate per-column
distinct aggregations: 5.4 s).  The two 1-row/4-row results are
collected and unpivoted DRIVER-SIDE via local_df (a lazy per-column
union of selects re-plans the corpus aggregation once per column —
measured 8 FileScans for 4 columns — the other trap).  A 100 TB
profile would swap exact distincts for approx_count_distinct, which
CAN share the stats pass.

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
    r = one.collect()[0]  # stats pass
    nd = {
        int(row["i"]): int(row["nd"])
        for row in profile_distinct_frame(orders).collect()  # distinct pass
    }
    n = int(r["__n"])
    # All-NULL columns (ADVICE r12): the distinct pass emits no (i, nd)
    # row (count(DISTINCT) = 0) and sum(length(...)) is NULL — DuckDB
    # renders avg_len as NULL there too, so propagate None rather than
    # fabricating 0.0.
    recs = [
        {
            "col_name": c,
            "n_rows": n,
            "n_null": int(r[f"{c}__nulls"]),
            "n_distinct": nd.get(i, 0),
            "min_value": r[f"{c}__min"],
            "max_value": r[f"{c}__max"],
            # integer HALF_UP 4dp mean length
            "avg_len": (
                None
                if r[f"{c}__lensum"] is None
                else ((20000 * int(r[f"{c}__lensum"]) + n) // (2 * n)) / 10000.0
            ),
        }
        for i, c in enumerate(PROFILE_COLS)
    ]
    return local_df(
        spark,
        recs,
        "col_name string, n_rows bigint, n_null bigint, n_distinct bigint, "
        "min_value string, max_value string, avg_len double",
    ).orderBy("col_name")


def profile_agg_frame(orders: DataFrame) -> DataFrame:
    """The 1-row stats aggregate (no distincts — see module
    docstring) — exposed so tests can pin its plan (one FileScan,
    HashAggregate)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in PROFILE_COLS:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"{c}__nulls"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.sum(F.length(s).cast("bigint")).cast("bigint").alias(f"{c}__lensum"),
        ]
    return orders.agg(*aggs)


def profile_distinct_frame(orders: DataFrame) -> DataFrame:
    """Exact per-column distinct counts as (i, nd) rows: one expand
    pass + two hash aggregations (the fast shape; module docstring)."""
    pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), F.col(c).cast("string").alias("v"))
                    for i, c in enumerate(PROFILE_COLS)
                ]
            )
        ).alias("z")
    ).select("z.i", "z.v")
    return (
        # NULLs are excluded to match SQL count(DISTINCT c) semantics —
        # without the filter a nullable column counts NULL as a value
        # and diverges from the oracle by one (review r12)
        pairs.filter(F.col("v").isNotNull())
        .groupBy("i", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    )


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
