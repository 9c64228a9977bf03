"""q5/q9 over the year-partitioned bucketed layout (VERDICT r11 #8):
the composed 100 TB layout, extended beyond q3 to the rest of the
shuffle-bound TPC-H spine.

- ``q5_partitioned``: q5's date window is EXACTLY one order year
  ([1996-01-01, 1997-01-01)), so the orders scan prunes to the single
  ``o_year=1996`` directory at planning time — the best case for the
  layout (q3's 6-of-7-year predicate was the worst).  lineitem has no
  date predicate in q5, so its scan stays full but bucket-co-located;
  the join and aggregate shapes are q5_bucketed's (_q5_shape — shared
  implementation, zero fact exchanges, SHUFFLE_HASH per-bucket build).
- ``q9_partitioned``: q9 carries NO date predicate, so partition
  pruning buys nothing — this variant exists to pin that the ONE
  layout serves the whole spine without regression (at 100 TB you
  keep one fact layout, not one per query), and ``o_year`` is read
  straight off the partition directory instead of being computed from
  o_orderdate per row.

Both share their join/agg spine with the bucketed variants
(bucketed._q5_shape / _q9_shape) so a shape change cannot silently
diverge the registered layouts (the r11 q3 lesson), and both reuse
the raw queries' oracle SQL — the layout must not change a value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.functions.bucketing import partitioned_bucketed_db
from icechunk_spark.operators.bucketed import _q5_cust_side, _q5_shape, _q9_shape
from icechunk_spark.operators.tpch import Q5_SQL, Q9_SQL


def q5_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 with the orders scan pruned to exactly one year directory:
    ``o_year == 1996`` is the partition twin of the [1996, 1997) date
    window (the data-column bounds stay, as in q3_partitioned)."""
    db = partitioned_bucketed_db(spark, sf_dir)
    orders = spark.table(f"{db}.orders").filter(
        (F.col("o_year") == F.lit(1996))
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return _q5_shape(
        spark,
        sf_dir,
        spark.table(f"{db}.lineitem"),
        orders,
        _q5_cust_side(spark, sf_dir),
    )


def q9_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 on the partitioned layout: no pruning to be had (no date
    predicate), but the spine stays exchange-free and ``o_year`` comes
    from the partition directory, not a per-row year()."""
    db = partitioned_bucketed_db(spark, sf_dir)
    return _q9_shape(
        spark,
        sf_dir,
        spark.table(f"{db}.lineitem"),
        spark.table(f"{db}.orders"),
        F.col("o_year").cast("bigint"),
    )


QUERIES = {"q5_partitioned": q5_partitioned, "q9_partitioned": q9_partitioned}
ORACLES = {"q5_partitioned": Q5_SQL, "q9_partitioned": Q9_SQL}
