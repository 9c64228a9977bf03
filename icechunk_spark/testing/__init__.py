"""Shared correctness-comparison helpers (used by tools/check.py and
the pytest suite) — a local replica of the driver's oracle gate:
row count + column names + order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare(spark, con, fn, sql: str, sf_dir: str) -> list[str]:
    """Run the Spark query and oracle SQL; return a list of problems
    (empty = match)."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems = []
    if len(srows) != len(drows):
        problems.append(f"row count {len(srows)} vs {len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns {sorted(scols)} vs {sorted(dcols)}")
    if not problems and fingerprint(scols, srows) != fingerprint(dcols, drows):
        diffs = [
            (a, b) for a, b in zip(sorted(srows), sorted(drows)) if norm_row(a) != norm_row(b)
        ][:3]
        problems.append(f"value-hash mismatch; first diffs: {diffs}")
    return problems


def norm_row(r: tuple) -> tuple:
    return tuple(norm_value(v) for v in r)


# --- reference-parity testing exports --------------------------------------
# (icechunk-python/python/icechunk/testing/__init__.py re-exports
# LatencyStorage; invariants.py ships reusable ancestry checks.)

from icechunk_spark.repo.storage import LatencyStorage  # noqa: E402,F401


def assert_ancestry_invariants(
    ancestry, known_commits=None, *, must_contain_initial: bool = True
) -> None:
    """Fundamental invariants of a snapshot ancestry chain (reference
    parity: icechunk.testing.invariants.assert_ancestry_invariants):
    timestamps monotonically non-increasing, each snapshot appears at
    most once, every non-terminal snapshot has a parent, and the chain
    terminates at a parentless (initial) snapshot unless expiration
    re-parenting is allowed via ``must_contain_initial=False``."""
    import itertools

    ancestry = list(ancestry)
    ids = [s.id for s in ancestry]
    if known_commits is not None:
        assert set(ids).issubset(set(known_commits)), "unknown snapshot in ancestry"
    assert all(
        a.written_at >= b.written_at for a, b in itertools.pairwise(ancestry)
    ), "ancestry timestamps must be non-increasing"
    assert len(set(ids)) == len(ids), "duplicate snapshot in ancestry"
    assert all(s.parent_id is not None for s in ancestry[:-1]), (
        "non-terminal snapshot without a parent"
    )
    if must_contain_initial and ancestry:
        assert ancestry[-1].parent_id is None, (
            "ancestry must terminate at the initial snapshot"
        )
