"""Exact embedding pooling: per-group mean vectors in integer micros.

The doc-from-chunks aggregation every embedding pipeline runs (pool
sentence/chunk vectors into a document vector, pool member vectors into
a cluster centroid). A naive float mean is order-dependent in its last
bits — Spark's partial aggregation sums in partition order, so the same
data can produce different last-ulp results run to run, and no DuckDB
twin can hash-match it. This module applies the repo's money
convention (plans/relational.py docstring) to vectors: quantize each
component to integer micros FIRST (one deterministic rounding per
input value), then aggregate integers — exact, associative,
partitioning-independent — and divide once at the end (a single IEEE
op on agreed integers is identical everywhere).

The contract is therefore "mean of quantized vectors", not "quantized
mean of vectors" — stated rather than hidden; at micro precision the
difference is below any embedding-model noise floor.

Scale shape: posexplode fans each vector into (group, idx, micro) rows
— fan-out = dim, the same expansion a columnar store pays to read the
array — then ONE map-side-combinable groupBy (group, idx) and one
per-group reassembly keyed by the group alone. Shuffle volume is
bounded by |groups| x dim rows of longs, never by input count. No UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mean_pool_micro"]


def mean_pool_micro(
    df: DataFrame,
    vec: str,
    group_by: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """(group, n_vecs, sum_micro ARRAY<LONG>, mean ARRAY<DOUBLE>).

    ``sum_micro`` is the exact integer component sum (the cross-engine
    verifiable artifact); ``mean`` = sum_micro / (n_vecs * scale)
    componentwise — one division per component on agreed integers.
    Vectors must share one dimension per group; NULL vectors are
    skipped (rows with no surviving vector emit nothing).
    """
    if scale < 1:
        raise ValueError("scale must be >= 1")
    exploded = (
        df.filter(F.col(vec).isNotNull())
        .select(
            F.col(group_by).alias("grp"),
            F.posexplode(vec).alias("idx", "v"),
        )
        .select(
            "grp",
            "idx",
            F.round(F.col("v").cast("double") * scale)
            .cast("long")
            .alias("micro"),
        )
    )
    per_idx = exploded.groupBy("grp", "idx").agg(
        F.sum("micro").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_idx.groupBy("grp")
        .agg(
            # every component sees every vector, so any idx's count is
            # the group's vector count; min = deterministic pick
            F.min("n").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct("idx", "s"))
            ).alias("pairs"),
        )
        .select(
            F.col("grp").alias(group_by),
            "n_vecs",
            F.transform(F.col("pairs"), lambda p: p["s"]).alias(
                "sum_micro"
            ),
            F.transform(
                F.col("pairs"),
                lambda p: p["s"].cast("double")
                / (F.col("n_vecs") * F.lit(scale)),
            ).alias("mean"),
        )
    )
