"""Count-Min sketch columns: mergeable approximate frequencies.

The frequency-serving sibling of the incremental-mart HLL column
(operators/incremental.py): a mart that must answer "how often has
value x appeared for key k" cannot keep exact per-value counts when the
value domain is unbounded (user agents, URLs, query strings), but a
Count-Min sketch (Cormode & Muthukrishnan 2005) per key is a FIXED
``width × depth`` array of counters whose merge is elementwise addition
— decomposable, so incremental maintenance is O(Δ): sketch the delta,
``cms_merge`` onto the stored column, serve point estimates at read
time. Estimates only ever OVER-count (collisions add, never subtract),
with error ≤ 2N/width at ~exp(-depth) probability — the one-sided bound
callers can design around.

Cross-engine determinism: the base hash is the md5-derived 32-bit int
(functions.text.shingle_hash32 convention) pushed through the repo's
Carter-Wegman row constants (MINHASH_A/B) — so a DuckDB twin can build
the identical sketch, and merge is integer addition (bit-exact at any
partitioning or batch split).

Scale shape: building explodes ``depth`` rows per input, aggregates
(key, cell) counts — map-side combinable, shuffle bounded by
|keys| × width × depth cells, never input size — and assembles the
dense counter array via a per-key map lookup. No UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import MINHASH_A, MINHASH_B, MINHASH_PRIME

__all__ = ["cms_build", "cms_merge", "cms_estimate"]

_MAX_DEPTH = len(MINHASH_A)


def _base32(value: Column) -> Column:
    """md5-derived 32-bit base hash of the value's string form."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 8), 16, 10
    ).cast("long")


def _cell(value: Column, row: int, width: int) -> Column:
    """Flattened counter index of ``value`` in sketch row ``row``."""
    a, b = MINHASH_A[row], MINHASH_B[row]
    pos = (F.lit(a) * _base32(value) + F.lit(b)) % F.lit(
        MINHASH_PRIME
    ) % F.lit(width)
    return (F.lit(row * width) + pos).cast("int")


def _check(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError("width must be >= 2")
    if not 1 <= depth <= _MAX_DEPTH:
        raise ValueError(f"depth must be in [1, {_MAX_DEPTH}]")


def cms_build(
    df: DataFrame,
    keys: list[str],
    value: str,
    *,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """One row per key group: (keys..., cms ARRAY<LONG> of width*depth).

    NULL values are skipped (SQL aggregate convention). Keys with only
    NULL values emit nothing.
    """
    _check(width, depth)
    v = F.col(value)
    cells = F.array(*[_cell(v, r, width) for r in range(depth)])
    hits = (
        df.filter(v.isNotNull())
        .select(*keys, F.explode(cells).alias("cell"))
        .groupBy(*keys, "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(width * depth - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return (
        hits.groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("cell", "cnt"))
            ).alias("__m")
        )
        .select(*keys, dense.alias("cms"))
    )


def cms_merge(a: Column, b: Column) -> Column:
    """Elementwise sum — THE property that makes sketches incremental:
    cms(batch1) ⊕ cms(batch2) == cms(batch1 ∪ batch2) bit-exactly."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cms_estimate(
    cms: Column, value: Column, *, width: int = 256, depth: int = 4
) -> Column:
    """Point-frequency estimate: min over the depth rows' counters.
    Never under-counts; over-counts by hash collisions only."""
    _check(width, depth)
    return F.least(
        *[
            F.element_at(cms, _cell(value, r, width) + 1)
            for r in range(depth)
        ]
    )
