"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()``
counterpart on DuckDB at the given sf dir; compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values normalized).  Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision: the driver's gate hashes exact values, so the
        # local gate must be at least as strict (VERDICT r2 item 3 — .6g
        # masked penny-level drift on values >= 1e4).
        return f"{v:.17g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from icechunk_spark.engine import get_spark

    spark = get_spark("check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            # Driver parity: the driver materializes oracle results via
            # pandas, where DuckDB HUGEINT (bare SUM(BIGINT)) becomes
            # float64 and hash-diverges from Spark's bigint even though
            # fetchall() ints agree.  Fail loudly on any HUGEINT column
            # so the local gate can never be green where the driver is
            # red (VERDICT r3 item 2).
            hugeint_cols = [
                c
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if hugeint_cols:
            problems.append(
                f"oracle HUGEINT column(s) {hugeint_cols} — CAST(... AS BIGINT) in the SQL"
            )
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            fs, fd = fingerprint(scols, srows), fingerprint(dcols, drows)
            if fs != fd:
                problems.append("value-hash mismatch")
                key = lambda r: tuple(str(x) for x in r)  # noqa: E731 — None-safe sort
                for a, b in list(zip(sorted(srows, key=key), sorted(drows, key=key)))[:3]:
                    if a != b:
                        print(f"      spark={a}\n      duck ={b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
