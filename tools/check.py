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


def _file_md5(path: str) -> str | None:
    import hashlib

    try:
        with open(path, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()
    except OSError:
        return None


def _gates_path(repo: str) -> str:
    import os

    return os.path.join(repo, "LOCALGATES.json")


def _load_local_gates(repo: str) -> dict:
    import json

    try:
        with open(_gates_path(repo)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _record_local_gates(
    repo: str, passed: dict[str, dict], failed: "set[str] | None" = None
) -> None:
    """Merge this run's oracle passes into LOCALGATES.json and REVOKE
    entries for queries that failed this run: a red result must never
    leave a stale credit behind.  Each entry pins the defining
    module's CONTENT hash at gate time, so ``--stale`` can tell
    'module unchanged since it last passed the full gate locally'
    without trusting timestamps or clean trees.  Granularity caveat
    (same as the CHANGED detection): only the DEFINING module is
    pinned — an edit to a shared helper (functions/, catalog) does not
    invalidate credits; the full-gate runs before each round close are
    the backstop for that class."""
    import json

    gates = _load_local_gates(repo)
    for name in failed or ():
        gates.pop(name, None)
    for name, rec in passed.items():
        old = gates.get(name)
        # same module content, older entry at a LARGER sf: keep the
        # stronger credit — a later sf0.001 smoke pass must not
        # downgrade a standing sf0.01+ gate (the budget requires
        # driver-scale evidence)
        if (
            old
            and old.get("module_md5") == rec.get("module_md5")
            and _sf_of(old.get("sf_dir", "")) > _sf_of(rec.get("sf_dir", ""))
        ):
            continue
        gates[name] = rec
    with open(_gates_path(repo), "w") as f:
        json.dump(gates, f, indent=1, sort_keys=True)
        f.write("\n")


def _sf_of(sf_dir: str) -> float:
    """Parse the scale factor from a testdata dir name; 0.0 if unknown."""
    import os
    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    try:
        return float(m.group(1)) if m else 0.0
    except ValueError:
        return 0.0


def stale_report() -> int:
    """``check.py --stale``: for every registered query, its last
    driver-green round and whether its DEFINING MODULE changed since
    that round's record landed (VERDICT r7 #10: edits after a green
    row silently invalidate it — this makes the rotation auditable).
    Exit 1 when any green query has changed since its check."""
    import glob
    import json
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # query -> (last round with all-green row, ever seen)
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            ok = row.get("rows_match") and row.get("schema_match") is not False
            ok = ok and row.get("hash_match") is not False and not row.get("err")
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)

    # round -> commit that ADDED its correctness record
    def record_commit(rnd: int) -> str | None:
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--",
             f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"],
            capture_output=True, text=True, cwd=repo,
        ).stdout.split()
        return out[0] if out else None

    # query -> defining module file (the module whose QUERIES dict owns it)
    import __spark_entry__  # noqa: F401 — ensures sys.path set up
    from icechunk_spark import registry

    owner: dict[str, str] = {}
    for mod in registry._modules():
        for name in getattr(mod, "QUERIES", {}):
            owner[name] = os.path.relpath(mod.__file__, repo)

    n_changed = 0
    rows = []
    for name in registry.all_queries():
        rnd = last_green.get(name)
        if rnd is None:
            rows.append((name, "never", "-", owner.get(name, "?")))
            continue
        commit = record_commit(rnd)
        changed = "?"
        if commit and name in owner:
            diff = subprocess.run(
                ["git", "diff", "--name-only", f"{commit}..HEAD", "--", owner[name]],
                capture_output=True, text=True, cwd=repo,
            ).stdout.strip()
            changed = "CHANGED" if diff else "clean"
            if diff:
                n_changed += 1
        rows.append((name, f"r{rnd}", changed, owner.get(name, "?")))

    width = max(len(r[0]) for r in rows)
    for name, rnd, changed, mod in sorted(rows, key=lambda r: (r[1], r[0])):
        print(f"{name:<{width}}  {rnd:>5}  {changed:<7}  {mod}")
    print(f"\n{n_changed} green queries have module edits since their last driver row")

    # Staleness-budget gate (VERDICT r8 #9): with 140 queries and a
    # 50-row driver window, a green row can silently age for rounds.
    # Budget: any row that is CHANGED since its check, OR whose last
    # green would age past r-3 by the time the NEXT round's record
    # lands, MUST be either inside the upcoming driver window (the
    # first 50 of registry PRIORITY) or covered by a LOCAL re-gate
    # (LOCALGATES.json, written by this tool on every oracle pass)
    # whose recorded module hash still matches — i.e. the module has
    # not been edited since the query last passed the full
    # rows+schema+hash gate locally.
    gates = _load_local_gates(repo)
    latest = max(last_green.values(), default=0)
    window = list(registry.all_queries())[:50]
    overdue = []
    n_local = 0
    for name, rnd, changed, _mod in rows:
        if name in window:
            continue
        why = None
        if rnd == "never" or changed == "CHANGED":
            why = changed if changed == "CHANGED" else "never"
        elif int(rnd[1:]) <= latest - 2:  # next record makes it r-3 stale
            why = "aging"
        if why is None:
            continue
        rec = gates.get(name)
        if (
            rec
            and name in owner
            and rec.get("module_md5") == _file_md5(os.path.join(repo, owner[name]))
            and rec.get("kind") == "oracle"
            # a quick sf0.001 smoke pass must not credit the budget:
            # the driver gates at sf0.01, and the half-point-landing
            # class only shows at larger SFs
            and _sf_of(rec.get("sf_dir", "")) >= 0.01
        ):
            n_local += 1
            continue  # locally re-gated on the exact current module
        overdue.append((name, rnd, why))
    if n_local:
        print(f"{n_local} out-of-window rows covered by current local re-gates")
    if overdue:
        print(f"\nSTALENESS BUDGET VIOLATED — {len(overdue)} rows need a window slot or a local re-gate:")
        for name, rnd, why in overdue:
            print(f"  {name}  {rnd}  {why}")
    else:
        print("\nstaleness budget OK: every changed/aging row is in the next window or locally re-gated")
    return 1 if overdue else 0


def main():
    if "--stale" in sys.argv:
        sys.exit(stale_report())
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
    passed_now: dict[str, str] = {}
    failed_now: set[str] = set()
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
            failed_now.add(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            passed_now[name] = "rows"
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
            failed_now.add(name)
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
            failed_now.add(name)
        else:
            print(f"ok    {name}: {len(srows)} rows")
            n_pass += 1
            passed_now[name] = "oracle"
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    # record this run's oracle passes so --stale can credit local
    # re-gates against the staleness budget (module-hash pinned)
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from icechunk_spark import registry

    owner = {}
    for mod in registry._modules():
        for qname in getattr(mod, "QUERIES", {}):
            owner[qname] = mod.__file__
    if passed_now or failed_now:
        _record_local_gates(
            repo,
            {
                qname: {
                    "module_md5": _file_md5(owner[qname]),
                    "sf_dir": sf_dir,
                    "kind": kind,
                }
                for qname, kind in passed_now.items()
                if qname in owner
            },
            failed=failed_now,
        )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
