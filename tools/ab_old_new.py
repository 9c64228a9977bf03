"""Interleaved old-vs-new A/B for operator optimizations: loads the
OLD operator module from `git show HEAD:<path>` into a scratch module
namespace, pins value equality of old vs new on the given sf dir,
then times both interleaved (fresh frame per run, noop sink).

    python tools/ab_old_new.py sf_dir n_trials module:query [module:query ...]

Example:
    python tools/ab_old_new.py /root/testdata/sf0.1 3 \
        similarity:pairwise_topk semdedup:semdedup
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_old_module(relmod: str):
    rev = os.environ.get("AB_OLD_REV", "HEAD")
    src = subprocess.run(
        ["git", "show", f"{rev}:icechunk_spark/operators/{relmod}.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    ).stdout
    name = f"old_{relmod}"
    spec = importlib.util.spec_from_loader(name, loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = name
    exec(compile(src, f"<HEAD:{relmod}>", "exec"), mod.__dict__)
    return mod


def main() -> None:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2])
    targets = [t.split(":") for t in sys.argv[3:]]

    from icechunk_spark.engine import get_spark

    spark = get_spark("ab-old-new")
    spark.sparkContext.setLogLevel("ERROR")
    from icechunk_spark.registry import all_queries

    queries = all_queries()
    # warm
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("g", (F.col("id") % 4).cast("int"))
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g int").count()

    for relmod, qname in targets:
        old = load_old_module(relmod)
        old_fn = getattr(old, qname)
        new_fn = queries[qname]
        spark.catalog.clearCache()
        a = old_fn(spark, sf_dir).collect()
        spark.catalog.clearCache()
        b = new_fn(spark, sf_dir).collect()
        same = [tuple(r) for r in a] == [tuple(r) for r in b]
        print(f"{qname}: equality {'OK' if same else 'MISMATCH'} ({len(a)} rows)")
        if not same:
            for ra, rb in zip(a, b):
                if tuple(ra) != tuple(rb):
                    print("  first diff:", tuple(ra), "vs", tuple(rb))
                    break
            continue
        res = {"old": [], "new": []}
        for _ in range(n):
            for key, fn in (("old", old_fn), ("new", new_fn)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                res[key].append(round(time.perf_counter() - t0, 3))
        print(
            f"{qname}: old min={min(res['old'])} {res['old']}  "
            f"new min={min(res['new'])} {res['new']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
