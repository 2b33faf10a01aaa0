"""Interval overlap join (operators/intervaljoin.py): equivalence with
the naive predicate join on generated data (incl. long intervals that
route through the broadcast legs), half-open boundary semantics,
bin-width invariance, keyed joins, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.intervaljoin import (
    overlap_join,
)


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid long, ls long, le long")


def _right(spark, rows):
    return spark.createDataFrame(rows, "rid long, rs long, re long")


def _pairs(df):
    return sorted((r["lid"], r["rid"]) for r in df.collect())


def _naive(left, right, extra=None):
    cond = (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
    out = left.crossJoin(right).filter(cond)
    if extra is not None:
        out = out.filter(extra)
    return sorted((r["lid"], r["rid"]) for r in out.collect())


def test_matches_naive_generated(spark):
    """Deterministic pseudo-random intervals, including a few spanning
    hundreds of bins (broadcast-leg coverage), at two bin widths."""
    lrows = [
        (i, (i * 37) % 500, (i * 37) % 500 + 1 + (i * 13) % 40)
        for i in range(120)
    ] + [(900, 0, 480), (901, 100, 2000)]     # long intervals
    rrows = [
        (i, (i * 53) % 500, (i * 53) % 500 + 1 + (i * 7) % 60)
        for i in range(120)
    ] + [(950, 50, 1500)]
    left, right = _left(spark, lrows), _right(spark, rrows)
    want = _naive(left, right)
    for w in (16, 100):
        got = _pairs(
            overlap_join(
                left, right, "ls", "le", "rs", "re",
                bin_width=w, max_bins=8,
            )
        )
        assert got == want, w
    assert want  # non-trivial


def test_half_open_boundaries(spark):
    left = _left(spark, [(1, 0, 10)])
    right = _right(
        spark, [(1, 10, 20), (2, 9, 20), (3, 0, 10), (4, 10, 10)]
    )
    got = _pairs(
        overlap_join(left, right, "ls", "le", "rs", "re", bin_width=4)
    )
    # [0,10) touches [10,20) only at the excluded endpoint; empty [10,10)
    # overlaps nothing
    assert got == [(1, 2), (1, 3)]


def test_exactly_once_across_shared_bins(spark):
    """A pair sharing many bins must appear once (first-shared-bin
    rule), even when the intervals start in different bins."""
    left = _left(spark, [(1, 0, 100)])
    right = _right(spark, [(1, 50, 90)])
    out = overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=10, max_bins=64
    )
    assert out.count() == 1


def test_keyed_join_restricts_pairs(spark):
    left = spark.createDataFrame(
        [(1, 7, 0, 10), (2, 8, 0, 10)], "lid long, luser long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(1, 7, 5, 15), (2, 9, 5, 15)], "rid long, ruser long, rs long, re long"
    )
    got = _pairs(
        overlap_join(
            left, right, "ls", "le", "rs", "re",
            bin_width=8, keys=[("luser", "ruser")],
        )
    )
    assert got == [(1, 1)]


def test_validation(spark):
    left = _left(spark, [(1, 0, 1)])
    with pytest.raises(ValueError, match="bin_width"):
        overlap_join(left, _right(spark, [(1, 0, 1)]),
                     "ls", "le", "rs", "re", bin_width=0)
    with pytest.raises(ValueError, match="disjoint"):
        overlap_join(left, left, "ls", "le", "ls", "le", bin_width=4)


def test_duplicate_rows_multiply_like_a_join(spark):
    left = _left(spark, [(1, 0, 10), (1, 0, 10)])
    right = _right(spark, [(2, 5, 15)])
    out = overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=4
    )
    assert out.count() == 2


def test_degenerate_intervals_dropped(spark):
    """Empty [x,x) and reversed (end < start) intervals contain no
    points: they must match nothing — and a reversed row must not
    reach the binned leg, where its negative bin count would slip past
    the max_bins guard into an unbounded F.sequence."""
    left = _left(
        spark, [(1, 5, 5), (2, 1_000_000_000, 0), (3, 0, 10)]
    )
    right = _right(spark, [(1, 0, 100), (2, 7, 7), (3, 50, 3)])
    got = _pairs(
        overlap_join(
            left, right, "ls", "le", "rs", "re",
            bin_width=4, max_bins=4,
        )
    )
    assert got == [(3, 1)]
