"""Skew-mitigation helpers for joins and aggregations at scale.

AQE's skew-join handling (enabled in ``engine.get_spark``) splits
oversized shuffle partitions at runtime, but it only helps
sort-merge joins.  These helpers cover the cases AQE can't:

- ``salted_agg``: two-phase aggregation for a groupBy where a few
  keys carry most rows.  Phase 1 aggregates (key, salt) partials —
  the hot key's rows spread over ``n_salts`` reducers — phase 2
  merges partials per key.  Only works for algebraic aggregates
  (sum/count/min/max), which is what we expose.
- ``salted_join``: replicate the small side ``n_salts`` times with an
  explicit salt column and salt the big side randomly, so one hot key
  no longer lands on a single reducer.  For dimension tables prefer
  ``broadcast()`` — this is for mid-size sides above the broadcast
  threshold but small enough to replicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — deterministic per row via
    a hash of all columns would be stabler for retries; random is fine
    for aggregation because partials merge commutatively."""
    return df.withColumn(col_name, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (function, input column) with
    function in {sum, count, min, max}.  Equivalent to a plain
    ``df.groupBy(group_cols).agg(...)`` but a hot key's phase-1 work
    spreads across ``n_salts`` reducers.
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            phase1_exprs.append(F.count(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").cast("bigint").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = with_salt(df, n_salts)
    partials = salted.groupBy(*group_cols, "__salt").agg(*phase1_exprs)
    return partials.groupBy(*group_cols).agg(*phase2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    once per salt value, join on (key AND salt).  ``on`` is the key
    equality predicate referencing columns of both inputs."""
    big_s = with_salt(big, n_salts, "__salt_b")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt_s")
    small_r = small.select("*", salts)
    joined = big_s.join(small_r, on & (F.col("__salt_b") == F.col("__salt_s")), how)
    return joined.drop("__salt_b", "__salt_s")
