"""Bulk multi-array ingestion glue (reference parity:
icechunk-python/python/icechunk/dask.py:61 ``store_dask``).

The reference's ``store_dask(sources=dask arrays, targets=zarr
arrays)`` fans chunk writes out to dask workers, each producing a
ForkSession changeset, then merges the changesets.  The Spark-native
equivalent of a lazy N-d source is a coordinate-rows DataFrame, and
the fan-out engine is Spark itself: each (source, target) pair is
written through a ForkSession whose chunk packing runs as an
executor-side Arrow job, and the staged changesets are merged with the
same reduction the reference uses (``merge_sessions``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from icechunk_spark.distributed import merge_sessions
from icechunk_spark.repo.errbase import IcechunkError
from icechunk_spark.repo.session import ForkSession, Session

__all__ = ["store_dask"]


def store_dask(
    *,
    sources: list[DataFrame],
    targets: list[str],
    session: Session,
    regions: "list[tuple[tuple[int, int], ...]] | None" = None,
    split_every: int | None = None,
) -> ForkSession:
    """Write each source DataFrame into the array at the matching
    target path and return ONE merged ForkSession holding every staged
    change (the caller merges it into their writable session and
    commits — the reference's contract).

    ``regions`` optionally restricts each write to a coordinate box
    ((start, stop) per dimension), mirroring ``dask.array.store``'s
    region semantics; rows outside the box are rejected rather than
    silently dropped.  ``split_every`` bounds how many changesets are
    merged per reduction step (reference dask.py:70) — staged
    manifests here are lists, so the tree reduce is only about keeping
    any single merge call small.
    """
    if len(sources) != len(targets):
        raise IcechunkError(
            f"sources ({len(sources)}) and targets ({len(targets)}) must pair up"
        )
    if regions is not None and len(regions) != len(sources):
        raise IcechunkError("regions must pair with sources")
    forks: list[ForkSession] = []
    for i, (src, path) in enumerate(zip(sources, targets)):
        fork = session.fork()
        if regions is not None and regions[i] is not None:
            from pyspark.sql import functions as F

            box = regions[i]
            meta = fork.array_meta(path)
            if len(box) != len(meta.shape):
                raise IcechunkError(
                    f"region for {path!r} has {len(box)} dims, array has "
                    f"{len(meta.shape)}"
                )
            cond = F.lit(True)
            for d, (start, stop) in enumerate(box):
                cond = cond & (F.col(f"i{d}") >= start) & (F.col(f"i{d}") < stop)
            n_outside = src.filter(~cond).limit(1).count()
            if n_outside:
                raise IcechunkError(
                    f"source {i} has rows outside its region {box}"
                )
        fork.write_array_df(path, src)
        forks.append(fork)
    if split_every and split_every >= 2:
        while len(forks) > 1:
            forks = [
                merge_sessions(forks[j : j + split_every])
                for j in range(0, len(forks), split_every)
            ]
        return forks[0]
    return merge_sessions(forks)
