"""Capture .explain("formatted") for EVERY declared query (guide §1)
into plans/r14/full/<name>.txt plus a one-line-per-query plan-shape
summary (Exchange count, join strategies, Python-eval nodes, pushed
filters present) at plans/r14/plan_shapes.tsv.

Lifecycle queries (repo_*, array_store_*, stream_*) execute work when
invoked and return driver-local frames; their captured plan is of the
returned frame — the shape note marks them `lifecycle`.

    python tools/explain_all_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = os.path.join(REPO, "plans", "r14", "full")
    os.makedirs(outdir, exist_ok=True)

    from icechunk_spark.engine import get_spark
    from icechunk_spark.registry import all_queries

    spark = get_spark("explain-all-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    rows = []
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            rows.append((name, f"ERROR {type(ex).__name__}"))
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(f"# {name} @ {sf_dir}\n\n{plan}")
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
        )
        pynodes = sorted(
            set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)", plan))
        )
        pushed = "pushed" if "PushedFilters: [" in plan and "PushedFilters: []" not in plan else "-"
        kind = (
            "lifecycle/local"
            if "LocalTableScan" in plan or "LocalRelation" in plan.splitlines()[0]
            else "plan"
        )
        rows.append(
            (
                name,
                f"exch={n_ex}\tjoins={','.join(joins) or '-'}\t"
                f"py={','.join(pynodes) or '-'}\t{pushed}\t{kind}",
            )
        )
        print(name, file=sys.stderr)
    with open(os.path.join(REPO, "plans", "r14", "plan_shapes.tsv"), "w") as f:
        f.write("query\tshape\n")
        for n, s in rows:
            f.write(f"{n}\t{s}\n")
    print(f"{len(rows)} queries captured")
    spark.stop()


if __name__ == "__main__":
    main()
