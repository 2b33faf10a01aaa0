"""Time-series resampling: align an irregular event stream to a regular
grid per key and forward-fill values across the gaps — the
dashboard/feature-engineering primitive every events table eventually
needs ("1-minute series per user, carrying the last observation").

Shape: the grid is generated per key with ``sequence`` + ``explode``
(rows = key_count x grid_len — linear, no join against a global
calendar table), observations land on their bucket via a UNION (by
name) rather than a join, and the carry-forward is one
``last(ignore_nulls)`` window per key ordered by bucket — a single
shuffle on the key, the same topology as the as-of family
(plans.events.purchase-asof path). No cross joins, no per-key driver
loops.

Forward-fill semantics: multiple observations inside one bucket keep
the LATEST (ts, then a stable tiebreak) — the value a sampler reading
at bucket close would see; buckets before a key's first observation
stay NULL (nothing to carry)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_ffill"]


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int,
    start_s: int | None = None,
    end_s: int | None = None,
) -> DataFrame:
    """Regular grid of ``step_s``-second buckets per key with the last
    observed ``value_col`` carried forward.

    Output: ``(key_col, bucket_s, value, observed)`` — ``bucket_s`` is
    the epoch-second bucket start, ``observed`` is 1 when the bucket
    contains a real observation, 0 when filled (value NULL before the
    key's first observation). Grid bounds default to the global
    min/max event time (two tiny aggregates); pass ``start_s``/
    ``end_s`` to pin them (e.g. for streaming micro-batch alignment).
    """
    if step_s <= 0:
        raise ValueError(f"step_s must be positive, got {step_s}")
    ev = events.select(
        F.col(key_col).alias("__k"),
        F.unix_timestamp(F.col(ts_col)).alias("__s"),
        F.col(value_col).alias("__v"),
    )
    if start_s is None or end_s is None:
        lo, hi = ev.agg(F.min("__s"), F.max("__s")).first()
        if lo is None:
            return events.sparkSession.createDataFrame(
                [], f"{key_col} long, bucket_s long, value double, observed int"
            )
        start_s = start_s if start_s is not None else int(lo - lo % step_s)
        end_s = end_s if end_s is not None else int(hi)
    # latest observation per (key, bucket): max over a (ts, value)
    # struct orders by time with the value as a deterministic tiebreak.
    obs = (
        ev.withColumn(
            "bucket_s", (F.col("__s") - (F.col("__s") % step_s)).cast("long")
        )
        .groupBy("__k", "bucket_s")
        .agg(F.max(F.struct("__s", "__v")).alias("__last"))
        .select(
            "__k",
            "bucket_s",
            F.col("__last.__v").alias("value"),
            F.lit(1).alias("observed"),
        )
    )
    grid = (
        ev.select("__k")
        .distinct()
        .select(
            "__k",
            F.explode(
                F.sequence(
                    F.lit(int(start_s)), F.lit(int(end_s)), F.lit(int(step_s))
                )
            ).alias("bucket_s"),
            F.lit(None).cast(obs.schema["value"].dataType).alias("value"),
            F.lit(0).alias("observed"),
        )
    )
    # union-then-window: grid rows carry NULL value; per bucket the
    # observed row (if any) wins via max(observed), and the fill is
    # last(value, ignorenulls) over buckets so far.
    unioned = (
        obs.unionByName(grid)
        .groupBy("__k", "bucket_s")
        .agg(
            F.max("observed").alias("observed"),
            F.max(F.struct("observed", "value")).alias("__best"),
        )
        .select(
            "__k", "bucket_s", F.col("__best.value").alias("value"), "observed"
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(
            "value", F.last("value", ignorenulls=True).over(w)
        )
        .filter(
            (F.col("bucket_s") >= int(start_s))
            & (F.col("bucket_s") <= int(end_s))
        )
        .select(
            F.col("__k").alias(key_col), "bucket_s", "value", "observed"
        )
    )
