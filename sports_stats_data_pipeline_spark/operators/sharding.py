"""Token-budget shard packing: assign documents to contiguous training
shards so each shard holds ~``budget`` tokens — the step that turns a
curated corpus into fixed-size training shards.

Semantics (the standard contiguous packing): documents are laid out in
``id_col`` order; a document's shard is ``floor(start_offset / budget)``
where ``start_offset`` is the exclusive running token total before it.
Every shard except the last then carries at least ``budget`` tokens
minus one document's worth, and at most ``budget`` plus one document's
worth — the deterministic, restart-stable layout (append-only corpora
never re-shuffle existing shards' prefix).

Scale shape — the whole point of this module: the naive formulation is
``SUM(tokens) OVER (ORDER BY id)``, a GLOBAL ordered window = one
executor sorting 100 TB of rows through a single partition. Instead the
classic two-level distributed prefix sum:

1. order-preserving coarse buckets (``id // chunk`` — contiguous id
   ranges, so bucket order == id order);
2. per-bucket token sums (one hash aggregate), then the exclusive
   prefix over BUCKETS — a window over ``n_buckets`` rows, trivially
   small;
3. broadcast the bucket offsets back and take the intra-bucket running
   sum (window partitioned BY bucket — every partition works in
   parallel).

Equivalent output to the global window (pinned against a DuckDB global
cumsum in tests), with the global sort replaced by one tiny window and
one partitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_token_shards(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``start_offset`` and ``shard`` columns (see module docstring).

    ``id_col`` must be unique and non-negative; shard layout follows
    ascending ``id_col`` order. ``budget`` is in tokens.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    max_id = docs.agg(F.max(id_col)).first()[0]
    if max_id is None:
        return docs.select(
            "*",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("shard"),
        ).limit(0)
    chunk = max(1, (int(max_id) + n_buckets) // n_buckets)

    bucketed = docs.withColumn(
        "__bucket", (F.col(id_col) / chunk).cast("long")
    )
    # exclusive prefix per bucket: tiny relation (n_buckets rows), the
    # single-partition window here is over buckets, not documents.
    bw = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(token_col).alias("__bucket_tokens"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__bucket_tokens").over(bw), F.lit(0))
            .cast("long")
            .alias("__bucket_offset"),
        )
    )
    # intra-bucket exclusive running sum — parallel across buckets.
    iw = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "start_offset",
            (
                F.col("__bucket_offset")
                + F.coalesce(F.sum(token_col).over(iw), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "shard", F.floor(F.col("start_offset") / budget).cast("long")
        )
        .drop("__bucket", "__bucket_offset")
    )
