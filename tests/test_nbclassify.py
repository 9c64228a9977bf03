"""nb_source_classifier: planted-signal learning proof + plan pins.

The driver testdata's sources share one near-uniform vocabulary, so
accuracy there is chance by construction (documented in the module).
Here we plant a real signal — two sources with DISJOINT vocabularies —
and require the classifier to separate them perfectly, which pins the
whole train/score/argmax pipeline (a sign flip, a swapped split, or a
broken smoothing term would all break it).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from icechunk_spark.catalog import TABLES
from icechunk_spark.operators.nbclassify import nb_source_classifier

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nbdata")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    rows = []
    for i in range(200):
        if i % 2 == 0:
            src, vocab = "alpha", [f"aa{j}" for j in range(10)]
        else:
            src, vocab = "beta", [f"bb{j}" for j in range(10)]
        text = " ".join(vocab[(i + k) % 10] for k in range(30))
        rows.append((i, text, "en", src, len(text)))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_planted_signal_is_learned_perfectly(spark, planted_dir):
    rows = nb_source_classifier(spark, planted_dir).collect()
    assert rows, "no test docs scored"
    # disjoint vocabularies: every prediction must be correct
    for r in rows:
        assert r["actual_source"] == r["predicted_source"], dict(r.asDict())
    total = sum(r["n_docs"] for r in rows)
    assert 20 <= total <= 80  # ~20% of 200 docs under the hash split


def test_nb_plan_broadcasts_model_and_stays_jvm(spark):
    df = nb_source_classifier(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the fixed-size model and label tables broadcast onto the data
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
