"""Hypothesis strategies for repository testing (reference parity:
icechunk-python/python/icechunk/testing/strategies.py — same ``__all__``
so a reference user's property tests import unchanged).

Adaptations to this engine, by necessity:

- ``splitting_configs`` takes ``arrays`` as an iterable of
  ``(path, ArrayMeta)`` pairs (the reference takes zarr.Array handles;
  this engine's array handle IS its path + metadata).
- ``repository_configs``'s ``num_updates_per_repo_info_file`` knob is
  accepted and ignored (that file-rollover tunable is a flatbuffers-
  plane detail the parquet metadata plane doesn't have).
- ``draw_older_than`` reads snapshot ``written_at`` stamps through the
  repo format reader instead of object-store key timestamps — the
  same values this engine's expire/GC compare against.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterable
from typing import Any

import hypothesis.strategies as st

__all__ = [
    "chunk_coordinates",
    "chunk_paths",
    "chunk_slicers",
    "draw_older_than",
    "repository_configs",
    "splitting_configs",
]


@st.composite
def splitting_configs(draw: st.DrawFn, *, arrays: Iterable[tuple[str, Any]]):
    """Random ManifestSplittingConfig over the given (path, ArrayMeta)
    pairs — one rule per array, matched by name or path, with a split
    size per randomly-chosen dimension."""
    from icechunk_spark.types import (
        ManifestSplitCondition,
        ManifestSplitDimCondition,
        ManifestSplittingConfig,
    )

    config_dict: dict[Any, dict[Any, int]] = {}
    for path, meta in arrays:
        if draw(st.booleans()):
            cond = ManifestSplitCondition.name_matches(path.split("/")[-1])
        else:
            cond = ManifestSplitCondition.path_matches(path)
        shape = list(meta.shape)
        dimnames = list(meta.dimension_names or [None] * len(shape))
        picks = draw(
            st.lists(
                st.sampled_from(
                    tuple(zip(shape, range(len(shape)), dimnames))
                ),
                min_size=1,
                unique=True,
            )
        )
        for size, axis, dimname in picks:
            if dimname is None or draw(st.booleans()):
                key: Any = ManifestSplitDimCondition.Axis(axis)
            else:
                key = ManifestSplitDimCondition.DimensionName(dimname)
            # setdefault so every drawn dimension's rule is kept (the
            # reference overwrites here — ADVICE r7 flagged the parity
            # quirk as narrowing property coverage; keeping all picks
            # matches the documented 'a split size per randomly-chosen
            # dimension' intent)
            config_dict.setdefault(cond, {})[key] = draw(
                st.integers(min_value=1, max_value=size + 10)
            )
    return ManifestSplittingConfig.from_dict(config_dict)


@st.composite
def repository_configs(
    draw: st.DrawFn,
    num_updates_per_repo_info_file: st.SearchStrategy[int] = st.integers(  # noqa: B008
        min_value=1, max_value=5
    ),
    inline_chunk_threshold_bytes: "st.SearchStrategy[int] | None" = None,
    splitting: "st.SearchStrategy | None" = None,
    ic_module=None,
):
    """Random RepositoryConfig (reference strategies.py:72)."""
    import icechunk_spark as default_mod

    ice = ic_module or default_mod
    manifest = None
    if splitting is not None:
        manifest = ice.ManifestConfig(splitting=draw(splitting))
    # num_updates_per_repo_info_file: drawn for draw-parity, unused
    # (flatbuffers-plane rollover knob — see module docstring)
    draw(num_updates_per_repo_info_file)
    kwargs: dict = {"manifest": manifest}
    if inline_chunk_threshold_bytes is not None:
        kwargs["inline_chunk_threshold_bytes"] = draw(inline_chunk_threshold_bytes)
    return ice.RepositoryConfig(**kwargs)


@st.composite
def chunk_coordinates(draw: st.DrawFn, numblocks: tuple[int, ...]) -> tuple[int, ...]:
    return draw(
        st.tuples(*(st.integers(min_value=0, max_value=b - 1) for b in numblocks))
    )


@st.composite
def chunk_slicers(
    draw: st.DrawFn, numblocks: tuple[int, ...], chunk_shape: tuple[int, ...]
) -> tuple[slice, ...]:
    """Tuple of slices indexing exactly one chunk of a regular grid."""
    return tuple(
        slice(coord * size, (coord + 1) * size)
        for coord, size in zip(draw(chunk_coordinates(numblocks)), chunk_shape)
    )


@st.composite
def chunk_paths(draw: st.DrawFn, numblocks: tuple[int, ...]) -> str:
    return "/".join(map(str, draw(chunk_coordinates(numblocks))))


def draw_older_than(data: st.DataObject, storage) -> datetime.datetime:
    """An ``older_than`` cutoff drawn from the repo's actual snapshot
    ``written_at`` stamps (min-1s .. max+1s), so expire/GC property
    tests exercise boundaries instead of always-everything /
    always-nothing cutoffs.  ``storage`` is a Storage or root path."""
    from icechunk_spark.repo import format as fmt

    stamps = [
        fmt.read_snapshot(storage, sid).written_at
        for sid in fmt.list_snapshot_ids(storage)
    ]
    if not stamps:
        raise ValueError("repository has no snapshots to draw a cutoff from")
    lo, hi = min(stamps) - 1.0, max(stamps) + 1.0
    ts = data.draw(st.floats(min_value=lo, max_value=hi))
    return datetime.datetime.fromtimestamp(ts, tz=datetime.timezone.utc)
