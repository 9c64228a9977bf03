"""Bucketed (co-located) join support.

The sf10 decade probe (BASELINE.md round-8) established the one
structural gap of this engine at single-node scale: the
lineitem ⋈ orders spine of q3/q5/q9 is a join of two SF-scaled
tables, so Catalyst must exchange both sides — plans are otherwise
clean (filters pushed, dims broadcast, partial aggs map-side), the
shuffle itself is the cost, and no session knob removes it from raw
parquet.

The storage-level answer — the reason Hive bucketing and Iceberg
distribution specs exist — is to pay the shuffle ONCE at write time:
both tables are written bucketed and sorted by the join key, and
every subsequent join of the pair reads co-located buckets.
Catalyst then elides both exchanges AND both sorts (one file per
bucket ⇒ FileSourceScanExec reports outputOrdering), and a groupBy
whose keys contain the bucket column reuses the same partitioning —
q3's whole fact pipeline runs with ZERO fact-table shuffles
(pinned in tests/test_bucketed.py; measured in tools/bench_bucketed.py).

Scale notes:
- Bucket count (measured rule, r9 probe at sf10): keep each bucket's
  on-disk bytes in the 64-512 MB band — ``suggest_buckets`` encodes
  it.  Below the band, task-scheduling floor dominates; above it, a
  single bucket file exceeds one task's comfortable scan+merge unit
  and caps scan parallelism (the r8 VERDICT's 100 TB concern: a
  32-bucket 100 TB fact = 3 TB files).  Probing 32 vs 64 vs 128 at
  sf10 (2.3 GB lineitem → 72/36/18 MB buckets) measured identical
  query times within run variance — the band is wide; the failure
  mode is only leaving it upward.  At 100 TB the same rule gives
  ~2^18 buckets; in practice the fact table is ALSO date-partitioned,
  so the rule applies per partition and the per-directory file count
  stays in the hundreds.
- The write itself repartitions by the bucket key so each bucket is
  exactly one file — that single shuffle is the amortized cost and
  replaces the per-query exchange on every future join/agg keyed on
  the bucket column.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

from icechunk_spark.catalog import load_tables

BUCKETS = 32

#: bucketed-db locations created by THIS process; reaped at exit.
#: Locations are session-unique (applicationId in the digest) so no
#: other live process can be scanning them — the atexit reap closes
#: the unbounded-/tmp-growth leak without reintroducing the
#: concurrent-process stale-dir race the session-unique naming fixed.
_OWNED_LOCATIONS: set[str] = set()


def _reap_owned_locations() -> None:
    for loc in _OWNED_LOCATIONS:
        shutil.rmtree(loc, ignore_errors=True)


atexit.register(_reap_owned_locations)

#: one bucket's on-disk target (see module docstring: the measured
#: 64-512 MB comfort band's midpoint, biased low so the default never
#: exits the band upward as data grows)
TARGET_BUCKET_BYTES = 128 * 1024 * 1024

#: table -> bucket/sort key written by :func:`bucketed_db`
BUCKET_KEYS: dict[str, str] = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def table_bytes(sf_dir: str, table: str) -> int:
    """On-disk bytes of a source parquet table (file or directory) —
    the size probe behind suggest_buckets and the operators'
    broadcast-hint gates."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def suggest_buckets(
    total_bytes: int,
    min_buckets: int = BUCKETS,
    target_bucket_bytes: int = TARGET_BUCKET_BYTES,
) -> int:
    """Bucket count for a fact table of ``total_bytes`` on disk: the
    next power of two that keeps one bucket under
    ``target_bucket_bytes``, never below ``min_buckets`` (cluster
    parallelism floor).  sf10 (2.3 GB) → 32; a 1 TB fact → 8192; at
    100 TB apply per date-partition (module docstring)."""
    n = max(min_buckets, -(-total_bytes // target_bucket_bytes))
    p = 1
    while p < n:
        p <<= 1
    return p


def session_db(spark: SparkSession, prefix: str, *digest_parts: object) -> str:
    """Create (or look up) a session-owned temp database whose name is
    content-addressed over ``digest_parts`` AND the Spark
    applicationId — the session-uniqueness invariant every bucketed
    temp db in this repo relies on (two concurrent processes sharing
    one content-addressed /tmp dir race: one session's stale-dir
    cleanup deletes parquet files the other is mid-scan on).  The
    location is registered for the atexit reap.  Callers remain
    responsible for their own tableExists idempotency checks."""
    digest = hashlib.md5(
        ("|".join(str(x) for x in digest_parts) + f"|{spark.sparkContext.applicationId}").encode()
    ).hexdigest()[:12]
    db = f"{prefix}_{digest}"
    loc = os.path.join(tempfile.gettempdir(), f"icechunk_spark_{prefix}_{digest}")
    _OWNED_LOCATIONS.add(loc)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    return db


def bucketed_db(
    spark: SparkSession,
    sf_dir: str,
    tables: dict[str, str] | None = None,
    buckets: int | None = BUCKETS,
) -> str:
    """Materialize bucketed+sorted copies of ``tables`` (default: the
    q3/q5/q9 fact spine) for ``sf_dir`` into a content-addressed
    session database; idempotent per (session, sf_dir, buckets, keys) — repeat calls
    are catalog lookups.  ``buckets=None`` applies the measured
    scaling rule (:func:`suggest_buckets` over the largest table's
    on-disk bytes).  Returns the database name."""
    tables = BUCKET_KEYS if tables is None else tables
    if buckets is None:
        buckets = suggest_buckets(max(table_bytes(sf_dir, t) for t in tables))
    # the digest covers the FULL parameter space — a second call with
    # different bucket/sort keys must get its own database, not a
    # silent cache hit on tables bucketed by the old key.  It ALSO
    # covers the Spark applicationId: the location is session-unique,
    # because two concurrent processes sharing one content-addressed
    # /tmp dir race — one session's stale-dir cleanup deletes parquet
    # files the other is mid-scan on (observed as FAILED_READ_FILE
    # when a gate run and the test suite bucketized the same sf_dir
    # simultaneously).  Orphaned dirs from ended sessions are plain
    # temp files; re-bucketizing per session is the 1-2 s cost that
    # buys race freedom.
    spec = ",".join(f"{t}:{k}" for t, k in sorted(tables.items()))
    db = session_db(spark, "ic_buckets", os.path.normpath(sf_dir), buckets, spec)
    src = load_tables(spark, sf_dir)
    for table, key in tables.items():
        if spark.catalog.tableExists(f"{db}.{table}"):
            continue
        (
            src[table]
            # one file per bucket => scans report per-bucket sortedness
            # and downstream SortMergeJoins skip the Sort too
            .repartition(buckets, key)
            .write.format("parquet")
            .bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"{db}.{table}")
        )
    return db


#: table -> (partition column def, bucket/sort key) written by
#: :func:`partitioned_bucketed_db`
PARTITION_SPECS: dict[str, tuple[str, str, str]] = {
    # (source date column, partition column name, bucket key)
    "lineitem": ("l_shipdate", "l_year", "l_orderkey"),
    "orders": ("o_orderdate", "o_year", "o_orderkey"),
}


def partitioned_bucketed_db(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = BUCKETS,
) -> str:
    """The 100 TB fact layout the module docstring promises, composed
    end to end: facts PARTITIONED by event year AND BUCKETED by the
    join key inside every partition.  Date predicates prune whole
    partition directories at planning time (PartitionFilters in the
    scan); the bucket layout still co-locates the lineitem ⋈ orders
    join (bucket ids span partition dirs, so the scan reports the
    hash partitioning and Catalyst elides both exchanges).  This is
    why suggest_buckets' sizing rule applies PER PARTITION: each
    year directory holds its own ``buckets`` files.

    One trade is deliberate: with multiple (sorted) files per bucket
    the scan no longer reports per-bucket ORDER, so a sort-merge join
    would re-sort — the partitioned variants pair the layout with the
    SHUFFLE_HASH hint (operators/bucketed.py), which needs no order.
    Idempotent per session like :func:`bucketed_db`."""
    import pyspark.sql.functions as F

    db = session_db(spark, "ic_pbuckets", os.path.normpath(sf_dir), buckets)
    src = load_tables(spark, sf_dir)
    for table, (date_col, part_col, key) in PARTITION_SPECS.items():
        if spark.catalog.tableExists(f"{db}.{table}"):
            continue
        (
            src[table]
            .withColumn(part_col, F.year(F.col(date_col)))
            # one file per (partition dir, bucket): repartition by the
            # bucket key so each task owns whole buckets, then the
            # writer splits a task's rows across its partition dirs
            .repartition(buckets, key)
            .write.format("parquet")
            .partitionBy(part_col)
            .bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"{db}.{table}")
        )
    return db
