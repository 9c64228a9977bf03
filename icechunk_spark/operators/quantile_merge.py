"""Mergeable quantile sketches (SURVEY.md §2b extension — the
quantile sibling of hll_mergeable_distinct): per-day fixed-width
histogram sketches over ``events.value`` that MERGE by bin-count
addition, so yesterday's sketches never get rescanned when today's
data arrives — the monitoring-pipeline shape where a dashboard wants
rolling p50/p90/p99 over an append-only event stream.

Determinism contract (what makes this oracle-checkable where t-digest
is not): values are fixed to integer cents once, the bin domain is
the integer [lo, hi] span with width = (hi-lo)/B + 1 (integer), and a
quantile estimate is the LOWER EDGE of the first bin whose cumulative
count reaches ceil(pct·n/100) — pure integer algebra end to end
(every division is an integer ``div``; the only double op is the
final exact cents/100 display division), so Spark and DuckDB agree
bit-for-bit.  Estimate error is bounded by one bin width; B=256 keeps
the merged state at ≤256 rows per stream regardless of event volume
(the mergeable-sketch invariant).

Scale shape: one map-side-combined groupBy(day, bin) builds all daily
sketches in a single pass over events (persisted: it feeds the merge,
the totals and the three quantile picks); the merge is a
≤(days x B)-row groupBy; the quantile pick is a window over ≤B rows.
Nothing driver-side but the 2-value domain row.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables, table_parquet_files

N_BINS = 256
PCTS = (50, 90, 99)


def _cents(x: float) -> int:
    """Mirror of Spark's round(value * 100): the multiply happens in
    IEEE doubles (identical product), then HALF_UP at scale 0 —
    Decimal(float).quantize(HALF_UP) matches BigDecimal rounding on
    every double (ties are only hit when the product is exactly
    representable as X.5; see .claude/skills/verify/SKILL.md).  The
    streaming z-score op carries its own executor-side copy of this
    idiom (streaming/events.py update closure) — keep the two in
    sync."""
    return int(Decimal(x * 100).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _domain_from_footer(sf_dir: str) -> tuple[int, int] | None:
    """events.value min/max in integer cents read off the parquet
    FOOTER statistics — a driver-side metadata read, no Spark job and
    no second corpus scan (VERDICT r11 #4; the footer min/max is the
    exact column min/max, and round(·*100) is monotone, so the cents
    domain is identical to the aggregate pre-scan this replaces).
    Returns None — caller falls back to the aggregate scan — if any
    row group lacks min/max stats or carries a non-finite bound."""
    import pyarrow.parquet as pq

    files = table_parquet_files(sf_dir, "events")
    if not files:
        return None
    mn: float | None = None
    mx: float | None = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            (i for i in range(md.num_columns) if md.schema.column(i).name == "value"),
            None,
        )
        if idx is None:
            return None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            if col.num_values == 0:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None
            lo, hi = float(st.min), float(st.max)
            if not (math.isfinite(lo) and math.isfinite(hi)):
                return None
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
    if mn is None:
        return None
    return _cents(mn), _cents(mx)


def _domain_scan(ev: DataFrame) -> tuple[int, int]:
    """Fallback domain: one aggregate pass over the cents column (the
    pre-r12 shape) — only taken when footer stats are unusable."""
    dom = ev.agg(F.min("c"), F.max("c")).first()
    if dom[0] is None:
        raise ValueError("quantile_sketch: empty events input — no value domain")
    return int(dom[0]), int(dom[1])


def quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"].select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    dom = _domain_from_footer(sf_dir)
    if dom is None:
        dom = _domain_scan(ev)
    lo, hi = dom
    width = max(1, (hi - lo) // N_BINS + 1)
    # per-day sketches: the state a streaming monitor would persist
    daily = ev.groupBy(
        "day", F.expr(f"(c - {lo}) div {width}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return quantiles_over_sketch(daily, lo, width)


def quantiles_over_sketch(
    daily: DataFrame, lo: int, width: int, pcts: tuple[int, ...] = PCTS
) -> DataFrame:
    """Merge a (day, bin, cnt) sketch frame by bin-count addition and
    read the quantile estimates off it — a ≤B-row window, never the
    raw events.  Shared by the batch op and the streaming twin
    (streaming_quantile.py) so the pick algebra cannot diverge.

    The sketch frame feeds three branches (merge, totals, picks), so
    it is persisted for the duration of this call and UNPERSISTED in
    a finally block (ADVICE r11: the lazy-return version leaked the
    cache in long-lived sessions); the ≤len(pcts)-row result comes
    back as a driver-local frame."""
    from pyspark.sql import Row

    from icechunk_spark.engine import local_df

    spark = daily.sparkSession
    daily = daily.persist()
    try:
        # merge WITHOUT rescanning events: bin-count addition.  The
        # merged frame is <= B rows, so the cumulative count, the
        # grand total n (a window total over the same tiny frame) and
        # ALL pct picks fit in ONE aggregation — the previous shape
        # built one crossJoin+filter+agg pipeline PER pct plus a
        # separate mixed count_distinct agg, ~6 extra tiny jobs of
        # pure floor (2.6 -> 1.1 s at sf0.1; values bit-identical:
        # min(bin | cum >= ceil(pct*n/100)) is the same integer
        # algebra, n = sum over merged == sum over daily)
        merged = daily.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))
        cum = merged.select(
            "bin",
            F.sum("cnt")
            .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.sum("cnt")
            .over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("bigint")
            .alias("n"),
        )
        pick = cum.agg(
            F.max("n").alias("n"),
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"({pct} * n + 99) div 100"),
                        F.col("bin"),
                    )
                ).alias(f"b{pct}")
                for pct in pcts
            ],
        ).first()
        n_days = daily.agg(F.count_distinct("day").alias("n_days")).first()["n_days"]
        # est_value mirrors the Spark expression cast((bin*width+lo)
        # as double)/100.0 exactly: ints < 2^53 convert to double
        # losslessly and the single double division is IEEE-identical
        rows = [
            Row(
                pct=pct,
                est_value=(
                    float(pick[f"b{pct}"] * width + lo) / 100.0
                    if pick[f"b{pct}"] is not None
                    else None
                ),
                n=pick["n"],
                n_days=n_days,
            )
            for pct in sorted(pcts)
        ]
    finally:
        daily.unpersist()
    return local_df(
        spark, rows, "pct int, est_value double, n bigint, n_days bigint"
    ).orderBy("pct")


QUANTILE_SKETCH_SQL = f"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS c FROM events
), dom AS (
  SELECT min(c) AS lo, GREATEST(1, (max(c) - min(c)) // {N_BINS} + 1) AS width FROM c
), daily AS (
  SELECT day, (c.c - dom.lo) // dom.width AS bin, count(*) AS cnt
  FROM c, dom GROUP BY 1, 2
), merged AS (
  SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY 1
), stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         (SELECT count(DISTINCT day) FROM daily) AS n_days
  FROM merged
), cum AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM merged
), q AS (
  SELECT pct FROM (VALUES (50), (90), (99)) t(pct)
)
SELECT pct,
       CAST((SELECT min(bin) FROM cum, stats WHERE cum >= (pct * n + 99) // 100)
              * dom.width + dom.lo AS DOUBLE) / 100.0 AS est_value,
       stats.n AS n, stats.n_days AS n_days
FROM q, dom, stats
ORDER BY pct
"""

QUERIES = {"quantile_sketch_mergeable": quantile_sketch_mergeable}
ORACLES = {"quantile_sketch_mergeable": QUANTILE_SKETCH_SQL}
