"""Dataset-ingestion glue (reference parity:
icechunk-python/python/icechunk/xarray.py:23 ``to_icechunk``).

The reference's ``to_icechunk(dataset, session)`` writes an xarray
Dataset into the versioned store through zarr.  xarray is not part of
this rebuild's stack — the Spark-native carrier of "labelled N-d data"
is a DataFrame of coordinate rows (``i0..ik`` + ``value``), which is
exactly what ``Session.write_array_df`` ingests with executor-side
Arrow chunk packing (repo/arrays.py:encode_array_chunks).  This module
gives that path the reference-shaped entry point: a reference user
porting ``to_icechunk(ds, session, group=...)`` writes
``to_icechunk(df, session, path=...)`` and gets the same durable
result — a committed chunked array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icechunk_spark.repo.errbase import IcechunkError
from icechunk_spark.repo.format import RefError
from icechunk_spark.repo.session import Session

__all__ = ["to_icechunk"]


def to_icechunk(
    obj: DataFrame,
    session: Session,
    *,
    path: str,
    shape: list[int] | None = None,
    chunk_shape: list[int] | None = None,
    dtype: str = "float64",
    fill_value=0.0,
    mode: str = "a",
) -> None:
    """Write a coordinate-rows DataFrame into the array at ``path``.

    ``mode`` follows the reference's zarr write modes (xarray.py:27):
    ``"w"`` replaces an existing array, ``"a"`` creates-or-appends
    (the default), ``"r+"`` requires the array to exist.  When the
    array must be created and ``shape`` is None it is inferred from
    the data's coordinate extents (one distributed max per dimension);
    ``chunk_shape`` is required at creation because the chunk grid is
    the scale contract a caller must choose deliberately.

    The write itself is ``write_array_df`` — chunks are packed and
    persisted by executors; nothing data-sized touches the driver.
    The caller commits (or the surrounding ``transaction`` does), same
    as the reference where ``to_icechunk`` stages and the session
    commit publishes.

    Reference #2312 (xarray half) is N/A here by construction: the
    removed ``synchronizer``/``zarr_version`` passthrough params never
    existed in this signature — this Spark-first form has no zarr
    library underneath to pass them to (keyword-only signature pinned
    in tests/test_glue_modules.py::test_no_legacy_zarr_passthrough).
    """
    if mode not in ("w", "a", "r+"):
        raise IcechunkError(f"unsupported mode {mode!r}; use 'w', 'a' or 'r+'")
    ndim = len([c for c in obj.columns if c.startswith("i") and c[1:].isdigit()])
    if ndim == 0:
        raise IcechunkError(
            "to_icechunk needs coordinate columns i0..ik plus a value column"
        )
    exists = True
    try:
        session.array_meta(path)
    except (RefError, KeyError):
        exists = False
    if mode == "r+" and not exists:
        raise IcechunkError(f"mode 'r+' requires {path!r} to exist")
    if mode == "w" and exists:
        session.delete_node(path)
        exists = False
    if not exists:
        if shape is None:
            extents = obj.agg(
                *[F.max(f"i{d}").alias(f"m{d}") for d in range(ndim)]
            ).collect()[0]
            shape = [int(extents[f"m{d}"]) + 1 for d in range(ndim)]
        if chunk_shape is None:
            raise IcechunkError(
                "creating an array needs an explicit chunk_shape — the "
                "chunk grid is the scale-out contract"
            )
        session.create_array(
            path,
            shape=shape,
            chunk_shape=chunk_shape,
            dtype=dtype,
            fill_value=fill_value,
        )
    session.write_array_df(path, obj)
