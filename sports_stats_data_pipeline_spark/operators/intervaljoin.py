"""Distributed interval overlap join — find pairs of overlapping
intervals across two relations without the nested-loop plan.

Spark can only plan a raw ``l_start < r_end AND r_start < l_end``
condition as a broadcast nested loop (quadratic per partition) — fine
for a handful of periods (plans/advanced.py range join), fatal for
interval × interval at scale (session overlap, validity-window
reconciliation, genomics-style region intersection).

The standard rewrite: quantize time into width-``w`` bins, explode each
interval to the bins it touches, equi-join on ``(keys..., bin)``, then
(a) verify real overlap and (b) emit each pair exactly once — only in
the FIRST bin both intervals share, ``max(floor(l_start/w),
floor(r_start/w))``. The shuffle is an equi-join Catalyst optimizes
like any other; fan-out per row is ``length/w + 1``.

Long-interval skew guard (same shape as operators/skewjoin.py's hot
path): an interval touching more than ``max_bins`` bins would explode
the fan-out, so oversized intervals are split off and joined by plain
broadcast predicate instead — bounded because by construction few
intervals span many bins when ``bin_width`` is chosen near the typical
interval length (and if MOST intervals are oversized, the right fix is
a bigger ``bin_width``, not this fallback). Pair classes partition
cleanly: (short×short) through bins, (long-left × all right) and
(short-left × long-right) through the broadcast legs — no pair is
emitted twice, none is missed.

Overlap semantics are half-open ``[start, end)``: touching endpoints
do NOT overlap. Starts/ends are BIGINT-comparable numbers (epoch
seconds, days — caller converts; keeps the binning exact integer
arithmetic). Column names of the two inputs must be disjoint.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_bins(start: str, end: str, w: int) -> Column:
    first = F.floor(F.col(start) / w).cast("long")
    # half-open: an interval ending exactly on a bin edge does not
    # touch that bin
    last = F.floor((F.col(end) - 1) / w).cast("long")
    return last - first + 1


def _explode_bins(df: DataFrame, start: str, end: str, w: int) -> DataFrame:
    return df.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / w).cast("long"),
                F.floor((F.col(end) - 1) / w).cast("long"),
            )
        ),
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    keys: Sequence[tuple[str, str]] = (),
    max_bins: int = 64,
) -> DataFrame:
    """All (left, right) pairs whose ``[start, end)`` intervals overlap
    (and agree on ``keys`` — pairs of (left_col, right_col) equi-join
    columns). Output carries every column of both inputs; each
    overlapping pair of input ROWS appears exactly once (duplicate
    input rows produce one output row per input-row pair, as a join
    should).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    if max_bins < 1:
        raise ValueError(f"max_bins must be >= 1, got {max_bins}")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"column names must be disjoint: {sorted(dup)}")
    overlap = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    key_cond = [F.col(a) == F.col(b) for a, b in keys]
    out_cols = [*left.columns, *right.columns]

    # Degenerate rows are dropped up front: an empty interval [x, x)
    # contains no points so it overlaps nothing under half-open
    # semantics, and a REVERSED interval (end < start, a corrupt row)
    # must not reach the binned leg — its negative bin count slips past
    # the <= max_bins guard and F.sequence(first, last) with last <
    # first would generate an unbounded DESCENDING bin array.
    left = left.filter(F.col(l_start) < F.col(l_end))
    right = right.filter(F.col(r_start) < F.col(r_end))

    l_short = left.filter(_n_bins(l_start, l_end, bin_width) <= max_bins)
    l_long = left.filter(_n_bins(l_start, l_end, bin_width) > max_bins)
    r_short = right.filter(_n_bins(r_start, r_end, bin_width) <= max_bins)
    r_long = right.filter(_n_bins(r_start, r_end, bin_width) > max_bins)

    first_shared = F.greatest(
        F.floor(F.col(l_start) / bin_width).cast("long"),
        F.floor(F.col(r_start) / bin_width).cast("long"),
    )
    binned_pairs = (
        _explode_bins(l_short, l_start, l_end, bin_width)
        .join(
            _explode_bins(r_short, r_start, r_end, bin_width)
            .withColumnRenamed("__bin", "__rbin"),
            [F.col("__bin") == F.col("__rbin"), *key_cond],
        )
        .filter(overlap & (F.col("__bin") == first_shared))
        .select(*out_cols)
    )

    def _predicate_leg(big: DataFrame, small: DataFrame) -> DataFrame:
        # the LONG side is the broadcast side (few rows by the guard's
        # premise); the big side streams through unshuffled
        out = big.crossJoin(F.broadcast(small)).filter(overlap)
        for c in key_cond:
            out = out.filter(c)
        return out.select(*out_cols)

    # long-left × ALL right, then short-left × long-right: partitions
    # the remaining pair classes without double counting
    return (
        binned_pairs.unionByName(_predicate_leg(right, l_long))
        .unionByName(_predicate_leg(l_short, r_long))
    )
