"""Reference-parity snapshot display types.

Mirrors icechunk-python/python/icechunk/snapshots.py: ``AncestryGraph``
(the visual commit-history object returned by
``Repository.ancestry_graph()`` — reference display.rs), plus re-exports
of ``Diff`` / ``SnapshotInfo`` / ``ManifestFileInfo``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from icechunk_spark.repo.format import SnapshotInfo
from icechunk_spark.repo.session import Diff
from icechunk_spark.types import ManifestFileInfo


@dataclass
class AncestryGraph:
    """A renderable view of commit history (reference parity:
    icechunk.AncestryGraph).  ``print()`` gives a Unicode tree in a
    terminal; Jupyter renders ``_repr_svg_``.  Only commits reachable
    from branches/tags appear — anonymous snapshots are not attached
    to any ref, same caveat as the reference.

    Built driver-side from ref metadata only (one JSON read per
    commit); never touches manifests or chunks.
    """

    #: snapshot_id -> SnapshotInfo, insertion-ordered newest-first per ref walk
    snapshots: dict[str, SnapshotInfo]
    #: ref label -> tip snapshot id ("branch:main", "tag:v1")
    refs: dict[str, str]
    plain: bool = False
    _children: dict[str, list[str]] = field(default_factory=dict, repr=False)

    def __post_init__(self) -> None:
        for s in self.snapshots.values():
            if s.parent_id is not None:
                self._children.setdefault(s.parent_id, []).append(s.id)

    @classmethod
    def from_repository(
        cls,
        repo,
        plain: bool = False,
        *,
        branch: "str | None" = None,
        tag: "str | None" = None,
        snapshot_id: "str | None" = None,
    ) -> "AncestryGraph":
        snaps: dict[str, SnapshotInfo] = {}
        refs: dict[str, str] = {}
        # scoped view (reference repository.py:1016): one of branch/
        # tag/snapshot_id limits the graph to that ref's linear history
        if branch or tag or snapshot_id:
            chain = list(
                repo.ancestry(branch=branch, tag=tag, snapshot_id=snapshot_id)
            )
            for s in chain:
                snaps[s.id] = s
            if chain:
                label = (
                    f"branch:{branch}"
                    if branch
                    else (f"tag:{tag}" if tag else f"snapshot:{snapshot_id[:8]}")
                )
                refs[label] = chain[0].id
            return cls(snaps, refs, plain=plain)
        for b in sorted(repo.list_branches()):
            for s in repo.ancestry(branch=b):
                refs.setdefault(f"branch:{b}", s.id)
                if s.id in snaps:
                    break
                snaps[s.id] = s
        for t in sorted(repo.list_tags()):
            for s in repo.ancestry(tag=t):
                if f"tag:{t}" not in refs:
                    refs[f"tag:{t}"] = s.id
                if s.id in snaps:
                    break
                snaps[s.id] = s
        return cls(snaps, refs, plain=plain)

    def _labels_for(self, sid: str) -> str:
        labels = [r for r, tip in self.refs.items() if tip == sid]
        if not labels:
            return ""
        inner = ", ".join(labels)
        return f" ({inner})"

    def __str__(self) -> str:
        # topological walk: roots (no parent in graph) first, children
        # indented under their parent — a rebased/forked history shows
        # as sibling sub-trees, which is the property the reference's
        # diagram conveys
        lines: list[str] = []
        roots = [
            s.id
            for s in self.snapshots.values()
            if s.parent_id is None or s.parent_id not in self.snapshots
        ]
        bullet = "*" if self.plain else "●"
        # iterative DFS — a linear 10^4-commit history must not hit
        # Python's recursion limit
        stack: list[tuple[str, int]] = [(r, 0) for r in sorted(roots, reverse=True)]
        while stack:
            sid, depth = stack.pop()
            s = self.snapshots[sid]
            msg = (s.message or "").splitlines()[0][:60] if s.message else ""
            lines.append(f"{'  ' * depth}{bullet} {sid[:12]}{self._labels_for(sid)} {msg}")
            for child in sorted(self._children.get(sid, []), reverse=True):
                stack.append((child, depth + 1))
        return "\n".join(lines) if lines else "(empty history)"

    def __repr__(self) -> str:
        return self.__str__()

    def _repr_svg_(self) -> str:
        """Minimal SVG: one row per commit, parent-child edges as
        vertical lines — enough for notebook display without a JS
        dependency."""
        rows = self.__str__().splitlines()
        h = 22 * max(1, len(rows)) + 10
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="640" height="{h}" '
            f'font-family="monospace" font-size="13">'
        ]
        for i, row in enumerate(rows):
            depth = (len(row) - len(row.lstrip())) // 2
            x = 10 + depth * 16
            y = 20 + i * 22
            parts.append(f'<circle cx="{x}" cy="{y - 4}" r="4" fill="#4078c0"/>')
            text = row.lstrip("* ●").replace("&", "&amp;").replace("<", "&lt;")
            parts.append(f'<text x="{x + 10}" y="{y}">{text}</text>')
        parts.append("</svg>")
        return "".join(parts)


__all__ = ["AncestryGraph", "Diff", "ManifestFileInfo", "SnapshotInfo"]
