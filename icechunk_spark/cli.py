"""Command-line interface for repository inspection, configuration,
and maintenance (reference parity: icechunk/src/cli/interface.rs —
inspect / config / maintenance from a shell).

    python -m icechunk_spark.cli info <root>
    python -m icechunk_spark.cli status <root>
    python -m icechunk_spark.cli set-status <root> read_only --reason "maint"
    python -m icechunk_spark.cli branches <root>
    python -m icechunk_spark.cli tags <root>
    python -m icechunk_spark.cli ancestry <root> [--branch main] [-n 10]
    python -m icechunk_spark.cli config <root>
    python -m icechunk_spark.cli inspect-file <root> snapshots/<id>.json
    python -m icechunk_spark.cli migrate <root> [--dry-run]
    python -m icechunk_spark.cli expire <root> --older-than 86400
    python -m icechunk_spark.cli gc <root> [--older-than 86400] [--dry-run]
    python -m icechunk_spark.cli compact <root>

Metadata commands (info/status/branches/tags/ancestry/config/migrate/
expire) read only the storage plane and start NO SparkSession; the
maintenance jobs (gc/compact) build one on demand.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any


def _repo(root: str, *, need_spark: bool = False):
    from icechunk_spark.repo import Repository

    spark = None
    if need_spark:
        from icechunk_spark.engine import get_spark

        spark = get_spark("icechunk-spark-cli")
    return Repository.open(spark, root)


def _emit(doc: Any) -> None:
    print(json.dumps(doc, indent=2, sort_keys=True, default=str))


def cmd_info(args) -> int:
    _emit(_repo(args.root).inspect_repo_info())
    return 0


def cmd_status(args) -> int:
    _emit(_repo(args.root).get_status().to_dict())
    return 0


def cmd_set_status(args) -> int:
    from icechunk_spark.repo import RepoAvailability, RepoStatus

    repo = _repo(args.root)
    repo.set_status(
        RepoStatus(
            availability=RepoAvailability[args.availability],
            limited_availability_reason=args.reason,
        )
    )
    _emit(repo.get_status().to_dict())
    return 0


def cmd_branches(args) -> int:
    repo = _repo(args.root)
    _emit({b: repo.lookup_branch(b) for b in sorted(repo.list_branches())})
    return 0


def cmd_tags(args) -> int:
    repo = _repo(args.root)
    _emit({t: repo.lookup_tag(t) for t in sorted(repo.list_tags())})
    return 0


def cmd_ancestry(args) -> int:
    repo = _repo(args.root)
    out = []
    for snap in repo.ancestry(branch=args.branch):
        out.append(
            {
                "id": snap.id,
                "message": snap.message,
                "written_at": snap.written_at_iso,
                "metadata": snap.metadata,
            }
        )
        if args.n and len(out) >= args.n:
            break
    _emit(out)
    return 0


def cmd_config(args) -> int:
    _emit(_repo(args.root).config().to_dict())
    return 0


def cmd_migrate(args) -> int:
    from icechunk_spark.repo.migrations import migrate_repository, spec_version_of

    applied = migrate_repository(args.root, dry_run=args.dry_run)
    _emit(
        {
            "applied_from_versions": applied,
            "dry_run": args.dry_run,
            "spec_version": spec_version_of(args.root),
        }
    )
    return 0


def cmd_expire(args) -> int:
    repo = _repo(args.root)
    expired = repo.expire_snapshots(older_than_seconds=args.older_than)
    _emit({"expired_snapshots": sorted(expired)})
    return 0


def cmd_gc(args) -> int:
    repo = _repo(args.root, need_spark=True)
    s = repo.garbage_collect(dry_run=args.dry_run, older_than_seconds=args.older_than)
    _emit(
        {
            "dry_run": args.dry_run,
            "chunk_files_deleted": s.chunk_files_deleted,
            "manifests_deleted": s.manifests_deleted,
            "snapshots_deleted": s.snapshots_deleted,
            "txlogs_deleted": s.txlogs_deleted,
        }
    )
    return 0


def cmd_inspect_file(args) -> int:
    """Header inspection of any metadata file (reference #2216):
    kind/format/compression discovered from content, no Spark."""
    _emit(_repo(args.root).inspect_metadata_file(args.relpath))
    return 0


def cmd_graph(args) -> int:
    """Terminal commit graph (reference parity: the ancestry_graph
    display — display.rs); --plain for ASCII-only output."""
    print(str(_repo(args.root).ancestry_graph(plain=args.plain)))
    return 0


def cmd_compact(args) -> int:
    repo = _repo(args.root, need_spark=True)
    snap_id = repo.rewrite_manifests(branch=args.branch)
    _emit({"snapshot_id": snap_id})
    return 0


def cmd_vrefs(args) -> int:
    """Virtual-ref audit (Spark job): per-location ref counts/bytes
    with vcc:// resolution, via Session.virtual_chunk_locations_df —
    driver-safe at any ref count (rows stream; only --limit print)."""
    repo = _repo(args.root, need_spark=True)
    df = repo.readonly_session().virtual_chunk_locations_df()
    rows = df.orderBy("location").limit(args.limit).collect()
    _emit([r.asDict() for r in rows])
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="icechunk-spark",
        description="Inspect, configure, and maintain icechunk_spark repositories.",
    )
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, fn, help_):
        sp = sub.add_parser(name, help=help_)
        sp.add_argument("root", help="repository root path or URI")
        sp.set_defaults(fn=fn)
        return sp

    add("info", cmd_info, "repo info: branches, tags, snapshots, metadata")
    add("status", cmd_status, "availability status")
    sp = add("set-status", cmd_set_status, "flip availability (online/read_only)")
    sp.add_argument("availability", choices=["online", "read_only"])
    sp.add_argument("--reason", default=None)
    add("branches", cmd_branches, "branch -> tip snapshot id")
    add("tags", cmd_tags, "tag -> snapshot id")
    sp = add("ancestry", cmd_ancestry, "commit history of a branch")
    sp.add_argument("--branch", default="main")
    sp.add_argument("-n", type=int, default=0, help="limit entries (0 = all)")
    sp = add("graph", cmd_graph, "commit graph across all refs (terminal tree)")
    sp.add_argument("--plain", action="store_true", help="ASCII bullets (CI/logs)")
    add("config", cmd_config, "persisted repository config")
    sp = add("inspect-file", cmd_inspect_file, "metadata file header: kind/compression")
    sp.add_argument("relpath", help="repo-relative file path (e.g. snapshots/<id>.json)")
    sp = add("migrate", cmd_migrate, "upgrade the layout to the current spec")
    sp.add_argument("--dry-run", action="store_true")
    sp = add("expire", cmd_expire, "expire history older than a cutoff")
    sp.add_argument("--older-than", type=float, required=True, metavar="SECONDS")
    sp = add("gc", cmd_gc, "garbage-collect unreachable files (Spark job)")
    sp.add_argument("--older-than", type=float, default=24 * 3600.0, metavar="SECONDS")
    sp.add_argument("--dry-run", action="store_true")
    sp = add("compact", cmd_compact, "rewrite manifests into one file (Spark job)")
    sp.add_argument("--branch", default="main")
    sp = add("vrefs", cmd_vrefs, "audit virtual chunk refs (Spark job)")
    sp.add_argument("--limit", type=int, default=1000)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except Exception as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
