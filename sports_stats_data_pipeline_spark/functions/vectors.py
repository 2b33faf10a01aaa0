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
    list_cosine_similarity (norms multiplied *after* their square roots).

    Cross-engine boundary contract (measured, round 7): on an EXACT
    clone pair the kernels differ by ~1 ulp around |cos| = 1 — this
    fold yields 0.9999999999999999, DuckDB clamps to exactly 1.0, a
    plain Python left fold yields 1.0000000000000002. Rank-safe: no
    representable double lies strictly between 1.0 and either
    neighbor, so no third pair's sim can interleave and flip an
    ordering against an oracle; value-safe through the operators'
    ROUND(·,4) / micro-score outputs. Oracles must therefore never
    emit a RAW cosine column (always round) and never threshold at a
    value an exact-duplicate pair could sit on (1.0 itself) — every
    registered query follows both rules."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-norm copy of ``a`` (zero vectors pass through unchanged —
    dividing by a zero norm would poison downstream cosines with NaN)."""
    n = norm(a)
    return F.when(
        n == 0, a
    ).otherwise(F.transform(a, lambda x: x / n))


def mean_pool(
    df,
    group_cols: list[str],
    vec_col: str = "embedding",
    out_col: str = "pooled",
):
    """Mean-pool each group's vectors into one embedding — the standard
    chunk-embeddings → document-embedding reduction.

    Scale shape: ``collect_list`` of whole vectors per group would build
    one giant array on a single reducer for a hot group; instead
    ``posexplode`` turns vectors into (group, pos, value) rows, a plain
    ``avg`` aggregates by (group, pos) — map-side-combinable, skew
    bounded by dim × group count, not group size — and the per-group
    vector re-assembles from exactly ``dim`` elements (bounded by the
    embedding dimension, never by how many vectors the group holds).
    Returns one row per group: group_cols + ``out_col`` array<double>.
    """
    exploded = df.select(
        *group_cols, F.posexplode(as_double(F.col(vec_col)))
    )
    by_pos = exploded.groupBy(*group_cols, "pos").agg(
        F.avg("col").alias("v")
    )
    return by_pos.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias(out_col)
    )
