"""Stream-stream interval join: run-to-completion output equals the
batch twin exactly — inner and left-outer (outer needs the terminal
watermark advanced by the flush sentinel to release unmatched rows)."""

from __future__ import annotations

import shutil
import uuid

import pytest

from sports_stats_data_pipeline_spark.streaming.join import (
    purchase_click_pairs_batch,
    purchase_click_pairs_stream,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(df, prefix):
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_stream_join_equals_batch_twin(spark, how):
    streamed, staging = purchase_click_pairs_stream(
        spark, SF, delay="2 hours", max_gap_minutes=60, how=how
    )
    try:
        sink = _run_to_memory(streamed, f"sj_{how}")
        got = _rows(spark.table(sink))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    want = _rows(
        purchase_click_pairs_batch(spark, SF, max_gap_minutes=60, how=how)
    )
    assert len(got) > 0
    assert got == want


def test_outer_join_emits_unmatched_purchases(spark):
    """The left-outer stream must contain null-click rows (purchases
    with no preceding click inside the gap) — the rows only the flush-
    advanced watermark can release."""
    streamed, staging = purchase_click_pairs_stream(
        spark, SF, delay="2 hours", max_gap_minutes=60, how="left_outer"
    )
    try:
        sink = _run_to_memory(streamed, "sj_nulls")
        rows = spark.table(sink).collect()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    unmatched = [r for r in rows if r["click_id"] is None]
    matched = [r for r in rows if r["click_id"] is not None]
    assert unmatched and matched
    assert all(r["gap_s"] is None for r in unmatched)
    assert all(0 <= r["gap_s"] <= 3600 for r in matched)
