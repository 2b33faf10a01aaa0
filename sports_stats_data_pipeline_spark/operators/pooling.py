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
    """(group, n_vecs, ragged INT, sum_micro ARRAY<LONG>,
    mean ARRAY<DOUBLE>).

    ``sum_micro`` is the exact integer component sum (the cross-engine
    verifiable artifact); ``mean`` divides EACH component by its own
    observation count — for equal-dim groups that is the ordinary
    vector mean, and for ragged input (mixed dims, NULL components)
    every component is still the true mean of the values that exist
    rather than a silently deflated number. ``ragged`` = 1 flags such
    groups (``n_vecs`` is the max per-component count) so callers that
    REQUIRE rectangular input can assert ``ragged == 0`` instead of
    consuming plausible-but-unintended numbers. NULL vectors are
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
        F.sum("micro").alias("s"),
        # count only values that EXIST at this component (NULL array
        # elements are skipped by sum but would inflate count(1))
        F.count("micro").alias("n"),
    )
    return (
        per_idx.groupBy("grp")
        .agg(
            F.max("n").alias("n_vecs"),
            (F.min("n") != F.max("n")).cast("int").alias("ragged"),
            F.array_sort(
                F.collect_list(F.struct("idx", "s", "n"))
            ).alias("pairs"),
        )
        .select(
            F.col("grp").alias(group_by),
            "n_vecs",
            "ragged",
            F.transform(F.col("pairs"), lambda p: p["s"]).alias(
                "sum_micro"
            ),
            # per-component division by that component's own count
            F.transform(
                F.col("pairs"),
                lambda p: p["s"].cast("double") / (p["n"] * F.lit(scale)),
            ).alias("mean"),
        )
    )
