"""Shared column expressions (all JVM-side pyspark.sql.functions —
no Python row UDFs in any hot path).

Cosine similarity over array<float> uses F.zip_with + F.aggregate so
it stays inside whole-stage codegen instead of crossing into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, computed JVM-side."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (matches the
    DuckDB oracle expression used in textstats/dedup)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def normalized_text(text: Column | str) -> Column:
    """Lowercase, collapse whitespace — canonical form for exact dedup."""
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
