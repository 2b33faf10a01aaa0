"""Streaming SCD2 maintenance (streaming/scd.py): batch-parity with the
one-shot build, marker-based replay idempotence, and crash-window
recovery composed with the staged-promote protocol."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.scd import scd2_build
from sports_stats_data_pipeline_spark.streaming.scd import (
    apply_scd2_batch_to_sink,
    run_streaming_scd2,
)

SCHEMA = "k long, attr string, seq long"

BATCHES = [
    [(1, "A", 10), (2, "X", 11)],
    [(1, "A", 20), (1, "B", 30), (3, "M", 21)],
    [(1, "B", 40), (2, "Y", 41), (3, "M", 42), (3, "N", 43)],
]


def _hist_rows(df):
    return sorted(
        (r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"], r["n_obs"])
        for r in df.collect()
    )


def test_streamed_history_equals_one_shot_build(spark, tmp_path):
    src = str(tmp_path / "changes")
    os.makedirs(src)
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    hist_path = str(tmp_path / "hist")
    out = run_streaming_scd2(
        spark, stream, hist_path, ["k"], ["attr"], "seq"
    )
    expected = scd2_build(
        spark.createDataFrame(
            [r for b in BATCHES for r in b], SCHEMA
        ),
        ["k"], ["attr"], "seq",
    )
    assert _hist_rows(out) == _hist_rows(expected)


def test_replayed_batch_is_noop(spark, tmp_path):
    hist_path = str(tmp_path / "hist")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    apply_scd2_batch_to_sink(hist_path, b0, 0, ["k"], ["attr"], "seq")
    apply_scd2_batch_to_sink(hist_path, b1, 1, ["k"], ["attr"], "seq")
    before = _hist_rows(spark.read.parquet(hist_path))
    # replay both (restart-from-checkpoint without markers would
    # double-apply; the in-dir markers make it a no-op)
    apply_scd2_batch_to_sink(hist_path, b0, 0, ["k"], ["attr"], "seq")
    apply_scd2_batch_to_sink(hist_path, b1, 1, ["k"], ["attr"], "seq")
    assert _hist_rows(spark.read.parquet(hist_path)) == before


def test_crash_before_promote_replays_cleanly(spark, tmp_path):
    """A staging dir abandoned mid-write (live dir still present) is
    discarded by recovery and the replayed batch applies exactly once."""
    hist_path = str(tmp_path / "hist")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    apply_scd2_batch_to_sink(hist_path, b0, 0, ["k"], ["attr"], "seq")
    # simulate: batch 1 crashed after (partially) staging, before promote
    shutil.copytree(hist_path, hist_path + ".staging")
    apply_scd2_batch_to_sink(hist_path, b1, 1, ["k"], ["attr"], "seq")
    expected = scd2_build(
        spark.createDataFrame(BATCHES[0] + BATCHES[1], SCHEMA),
        ["k"], ["attr"], "seq",
    )
    assert _hist_rows(spark.read.parquet(hist_path)) == _hist_rows(expected)


def test_crash_after_stage_before_promote_completes(spark, tmp_path):
    """Protocol invariant: live renamed aside only after staging is
    complete — live missing + .old present means staging is a FINISHED
    batch; recovery promotes it and the marker then skips the replay."""
    hist_path = str(tmp_path / "hist")
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    b1 = spark.createDataFrame(BATCHES[1], SCHEMA)
    apply_scd2_batch_to_sink(hist_path, b0, 0, ["k"], ["attr"], "seq")
    apply_scd2_batch_to_sink(hist_path, b1, 1, ["k"], ["attr"], "seq")
    done = _hist_rows(spark.read.parquet(hist_path))
    # reconstruct the mid-promote crash state: staging complete (with
    # marker), live renamed aside, promote rename not yet done
    shutil.copytree(hist_path, hist_path + ".staging")
    os.rename(hist_path, hist_path + ".old")
    apply_scd2_batch_to_sink(hist_path, b1, 1, ["k"], ["attr"], "seq")
    assert _hist_rows(spark.read.parquet(hist_path)) == done
    assert not os.path.exists(hist_path + ".staging")
    assert not os.path.exists(hist_path + ".old")
