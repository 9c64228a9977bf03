"""Branch-divergence census (SURVEY.md §2a extension): the
merge-PREVIEW query a versioned-store UI runs before merging — given
two diverged branches, find the merge base from ancestry, count the
cells each side changed since it, and count the cells BOTH changed
(the would-be conflicts).  Exercises create_branch + per-branch
transactions + ancestry walks + three-way snapshot reads in one
oracle-checked query (reference flows: Repository.create_branch /
ancestry, icechunk-python tests/test_version_control branch-fork
scenarios).

Scenario (deterministic from lineitem): v1 writes daily revenue;
``main`` then doubles days [0, 128); branch ``exp`` (forked at v1)
triples days [96, 224).  Merge base must resolve to v1; conflicts are
exactly the days in [96, 128) present in the data.  All divergence
counts are value-level diffs computed by READING the three snapshots
back (time travel), not by trusting the write ranges.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.operators.repo_queries import (
    CHUNK,
    EPOCH,
    N_DAYS,
    _daily_revenue,
    _materialize,
)
from icechunk_spark.repo.repository import Repository

DIV_SPAN = 224  # the union of both sides' touched ranges


def repo_branch_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = os.path.join(tempfile.gettempdir(), f"icb_{uuid.uuid4().hex}")
    try:
        repo = Repository.create(spark, root)
        # persist: rev feeds three write/encode actions (r14)
        rev = _daily_revenue(spark, sf_dir).persist()
        with repo.transaction(message="v1") as s:
            s.create_array("/revenue", shape=[N_DAYS], chunk_shape=[CHUNK])
            s.write_array_df("/revenue", rev)
        v1 = repo.lookup_branch("main")
        repo.create_branch("exp", v1)
        with repo.transaction(message="main: double [0,128)") as s:
            s.write_array_df(
                "/revenue",
                rev.filter(F.col("i0") < 128).withColumn("value", F.col("value") * 2),
            )
        with repo.transaction("exp", message="exp: triple [96,224)") as s:
            s.write_array_df(
                "/revenue",
                rev.filter((F.col("i0") >= 96) & (F.col("i0") < DIV_SPAN)).withColumn(
                    "value", F.col("value") * 3
                ),
            )
        main_tip = repo.lookup_branch("main")
        exp_tip = repo.lookup_branch("exp")
        # merge base: first snapshot common to both tips' ancestries
        main_chain = [sn.id for sn in repo.ancestry(snapshot_id=main_tip)]
        exp_ids = {sn.id for sn in repo.ancestry(snapshot_id=exp_tip)}
        base = next(sid for sid in main_chain if sid in exp_ids)

        def _read(sid: str, alias: str) -> DataFrame:
            return (
                repo.readonly_session(snapshot_id=sid)
                .read_array_df("/revenue", slices=[(0, DIV_SPAN)])
                .select("i0", F.col("value").alias(alias))
            )

        b = _read(base, "base_v")
        m = _read(main_tip, "main_v")
        e = _read(exp_tip, "exp_v")
        diff = (
            b.join(m, "i0", "full_outer")
            .join(e, "i0", "full_outer")
            .select(
                "i0",
                (~F.col("main_v").eqNullSafe(F.col("base_v"))).alias("cm"),
                (~F.col("exp_v").eqNullSafe(F.col("base_v"))).alias("ce"),
            )
        )
        out = diff.agg(
            F.sum(F.col("cm").cast("int")).cast("bigint").alias("n_changed_main"),
            F.sum(F.col("ce").cast("int")).cast("bigint").alias("n_changed_exp"),
            F.sum((F.col("cm") & F.col("ce")).cast("int"))
            .cast("bigint")
            .alias("n_conflict_cells"),
        ).withColumn("merge_base_is_fork_point", F.lit(base == v1))
        return _materialize(
            spark,
            out,
            "n_changed_main bigint, n_changed_exp bigint, "
            "n_conflict_cells bigint, merge_base_is_fork_point boolean",
        )
    finally:
        if "rev" in locals():
            rev.unpersist()
        shutil.rmtree(root, ignore_errors=True)


REPO_BRANCH_DIVERGENCE_SQL = f"""
WITH rev AS (
  SELECT CAST(datediff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE)) AS BIGINT) AS day_idx,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
  FROM lineitem
  WHERE datediff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE)) >= 0
    AND datediff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE)) < {DIV_SPAN}
  GROUP BY day_idx
)
SELECT CAST(sum(CASE WHEN day_idx < 128 AND revenue <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed_main,
       CAST(sum(CASE WHEN day_idx >= 96 AND revenue <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed_exp,
       CAST(sum(CASE WHEN day_idx >= 96 AND day_idx < 128 AND revenue <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conflict_cells,
       TRUE AS merge_base_is_fork_point
FROM rev
"""


QUERIES = {
    "repo_branch_divergence": repo_branch_divergence,
}

ORACLES = {
    "repo_branch_divergence": REPO_BRANCH_DIVERGENCE_SQL,
}
