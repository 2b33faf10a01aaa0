"""Z-order (Morton) clustering: lay a table out so parquet min/max
stats prune on SEVERAL columns at once — the `OPTIMIZE ZORDER BY`
capability of lakehouse engines, as a plain write-path operator.

A sort on (a, b) clusters perfectly on ``a`` but scatters ``b``: every
file spans b's whole range, so a ``b`` predicate prunes nothing.
Interleaving the bits of the two grid coordinates (the Morton / Z-space-
filling curve) makes rows that are close in z-key close in EVERY
interleaved dimension — each file covers a small hyper-rectangle, and
row-group min/max stats prune scans filtered on a, on b, or both. At
100 TB this is the difference between "time-range queries are fast"
(date partitioning alone) and "time-range AND entity-range queries are
fast" (partition by date, z-order within partitions by entity × time).

Shape: per-column bounds come from one map-side-combinable min/max
aggregate (tiny; pass ``bounds`` to skip it when the writer already
knows them, e.g. from the previous compaction's footer stats), grid
scaling and bit interleave are pure codegen expressions (no UDF), and
the physical clustering is ``repartitionByRange`` + in-partition sort
on the z-key — the same range-exchange a plain sorted write costs.

Limits: ``bits_per_col × n_cols <= 63`` (the z-key is one signed
BIGINT). 8-16 bits per column is plenty — the grid only needs to be
finer than the file count, not exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton key over ``cols`` (numeric/timestamp-castable): each column
    is min/max-scaled to a ``2**bits_per_col`` grid and the grid bits are
    interleaved LSB-first (bit j of column c lands at position
    ``j * n_cols + (n_cols - 1 - c)``). Returns a BIGINT column.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits_per_col * n > 63:
        raise ValueError(
            f"bits_per_col * n_cols must be <= 63 (one signed BIGINT), "
            f"got {bits_per_col} * {n}"
        )
    grid_max = (1 << bits_per_col) - 1
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            ]
        row = df.agg(*aggs).first()
        bounds = {
            c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols
        }
    grids = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None or hi <= lo:
            grids.append(F.lit(0).cast("long"))
            continue
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(grid_max + 1)
        ).cast("long")
        grids.append(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.lit(grid_max).cast("long"), scaled),
            )
        )
    parts = []
    for ci, g in enumerate(grids):
        for j in range(bits_per_col):
            parts.append(
                F.shiftleft(
                    F.shiftright(g, j).bitwiseAND(F.lit(1)),
                    j * n + (n - 1 - ci),
                )
            )
    key = parts[0]
    for p in parts[1:]:
        key = key + p
    return key.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits_per_col: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Write ``df`` to parquet at ``path`` clustered along the Z-curve of
    ``cols``: range-exchange on the z-key into ~``n_files`` files, sorted
    within each so row groups inherit tight min/max rectangles.

    ``partition_by`` layers the two pruning mechanisms the way a 100-TB
    table should: directory partitions (usually the date) give O(1)
    partition pruning on the coarse axis, and the Z-order WITHIN each
    partition gives row-group pruning on the remaining ``cols`` — the
    exchange ranges over (partitions, z-key) so each output file stays
    single-partition AND z-contiguous."""
    zk = zorder_key(df, cols, bits_per_col=bits_per_col, bounds=bounds)
    keyed = df.withColumn("__zkey", zk)
    parts = list(partition_by or [])
    keyed = keyed.repartitionByRange(
        n_files, *parts, "__zkey"
    ).sortWithinPartitions(*parts, "__zkey")
    writer = keyed.drop("__zkey").write.mode("overwrite")
    if parts:
        writer = writer.partitionBy(*parts)
    writer.parquet(path)
