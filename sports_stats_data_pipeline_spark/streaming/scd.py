"""Streaming SCD Type-2 maintenance — a CDC change stream folded into an
effective-dated dimension history via foreachBatch.

The batch operator (operators/scd.py) already has the O(Δ) incremental
apply; this wires it to Structured Streaming with the repo's crash-safe
stage→promote sink protocol (operators/sinks.py) plus a batch-id marker
for exactly-once REPLAY semantics: ``scd2_apply_batch`` is not
idempotent (re-merging a batch's seqs into a history that already
absorbed them would double-count ``n_obs`` and violate the unique-seq
contract), so each micro-batch writes a ``_batch_<id>`` marker file
INSIDE the staged history dir before the atomic promote. A replayed
batch sees its marker in the live dir and skips — and every crash
window is covered by the existing protocol invariant:

- crash before/while staging: ``recover_sink`` discards the partial
  staging dir; the batch replays in full;
- crash after staging, before/mid promote: ``recover_sink`` completes
  the promote; the marker (inside the promoted dir) makes the replay a
  no-op;
- crash after promote: marker present, replay is a no-op.

tests/test_streaming_scd.py pins batch-parity (streamed history ==
one-shot ``scd2_build`` over all changes) and marker-based replay
idempotence across each crash window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd import scd2_apply_batch, scd2_build
from ..operators.sinks import promote_staging, recover_sink


def _marker(path: str, batch_id: int) -> str:
    return os.path.join(path, f"_batch_{batch_id}")


def apply_scd2_batch_to_sink(
    history_path: str,
    batch: DataFrame,
    batch_id: int,
    keys: list[str],
    attrs: list[str],
    seq_col: str,
) -> None:
    """foreachBatch body: merge one CDC micro-batch into the parquet
    history at ``history_path`` (creating it on the first batch)."""
    s = batch.sparkSession
    recover_sink(history_path)
    if os.path.exists(_marker(history_path, batch_id)):
        return  # replayed batch, already folded in
    if os.path.exists(history_path):
        history = s.read.parquet(history_path)
        merged = scd2_apply_batch(history, batch, keys, attrs, seq_col)
    else:
        merged = scd2_build(batch, keys, attrs, seq_col)
    staging = history_path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    # markers ride inside the staged dir so they become visible exactly
    # when the new history does (single atomic rename); prior batches'
    # markers are carried forward — each promote replaces the whole dir
    # (pruned to a trailing window: Structured Streaming only ever
    # replays batches at/after the last checkpoint commit, never the
    # deep past, so old markers are dead weight)
    if os.path.exists(history_path):
        for name in os.listdir(history_path):
            if name.startswith("_batch_"):
                try:
                    keep = int(name.removeprefix("_batch_")) >= batch_id - 64
                except ValueError:
                    keep = True
                if keep:
                    open(os.path.join(staging, name), "w").close()
    open(_marker(staging, batch_id), "w").close()
    promote_staging(history_path)


def run_streaming_scd2(
    spark: SparkSession,
    changes_stream: DataFrame,
    history_path: str,
    keys: list[str],
    attrs: list[str],
    seq_col: str,
    checkpoint: str | None = None,
) -> DataFrame:
    """Drain ``changes_stream`` (availableNow) into an SCD2 history at
    ``history_path``; returns the final history DataFrame."""
    recover_sink(history_path)

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_scd2_batch_to_sink(
            history_path, batch, batch_id, keys, attrs, seq_col
        )

    q = (
        changes_stream.writeStream.foreachBatch(fold)
        .option(
            "checkpointLocation",
            checkpoint or history_path + ".checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(history_path)
