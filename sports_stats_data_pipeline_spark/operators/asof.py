"""Generic as-of join (trades/quotes-style event-time merge).

For each left row, attach the most recent right row with the same key
whose timestamp is <= (strictly < with ``strict=True``) the left
timestamp — SURVEY.md §2.3's as-of mapping.

Implementation is the union trick, not a join: tag both sides, union,
sort within key by time, carry the last-seen right payload forward with
``last(..., ignorenulls=True)`` over the preceding frame, keep left rows.
One shuffle on the key — compare an inequality join, which Spark can only
plan as a broadcast nested loop (quadratic per key). This is the 100 TB
shape: cost is sort + single pass, identical to streaming state logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = True,
    order_by: str | None = None,
) -> DataFrame:
    """Returns ``left`` with ``asof_<payload>`` columns attached.

    ``strict=True`` matches only right rows strictly earlier than the
    left timestamp (ties excluded); ``False`` includes simultaneous rows.
    Within equal timestamps the ordering tiebreak puts right rows first
    for non-strict (so they become visible) and left rows first for
    strict.

    ``order_by`` names a column present on BOTH sides (e.g. a globally
    unique event id) appended to the window ordering. Without it, equal-
    timestamp right rows have no deterministic order among themselves and
    ``last()`` picks an arbitrary payload. With it the cut becomes
    lexicographic on ``(ts, order_by)``: among equal-ts right rows the
    largest ``order_by`` wins, and for ``strict`` an equal-ts right row
    IS visible to a left row with a larger ``order_by`` — the SQL
    ``LAST_VALUE ... OVER (ORDER BY ts, id ROWS ... 1 PRECEDING)``
    semantics.
    """
    tie = [] if order_by is None else [F.col(order_by).alias("__tie")]
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *tie,
        F.struct(*left.columns).alias("__left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in right_payload],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *tie,
        F.lit(None).cast(lt.schema["__left_row"].dataType).alias("__left_row"),
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
    )
    # strict: left sorts before right at equal (ts[, tie]) — the right row
    # is not yet visible; non-strict: right first.
    side_order: Column = (
        F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    )
    ordering = (
        [F.col("__ts"), side_order]
        if order_by is None
        else [F.col("__ts"), F.col("__tie"), side_order]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    unioned = lt.unionByName(rt)
    carried = unioned.select(
        "__is_left",
        "__left_row",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        "__left_row.*", *[f"asof_{c}" for c in right_payload]
    )
