"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), JVM-side, no Python UDF.

Floats are widened to double *before* any arithmetic so results match the
DuckDB oracle's ``embedding::DOUBLE[]`` computation; the fold order of
``F.aggregate`` is the array's element order (left-to-right), same as the
oracle's loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|) — formula shaped to match DuckDB's
    list_cosine_similarity (norms multiplied *after* their square roots)."""
    return dot(a, b) / (norm(a) * norm(b))
