"""Watermark semantics: in append mode with a watermark, an event
arriving after its window's watermark expiry is dropped; on-time events
flush once the watermark passes their window end.

Batch boundaries are forced by running two separate availableNow passes
over a shared checkpoint — deterministic, unlike file-mtime ordering.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.streaming.pipeline import (
    EVENTS_RAW_SCHEMA,
)


def _ts(epoch_s: float) -> datetime.datetime:
    # naive datetime into the LTZ ts column = wall clock in the session
    # TZ (conftest pins UTC), so epoch_s round-trips exactly.
    return datetime.datetime.utcfromtimestamp(epoch_s)


BASE = 1_700_000_000
HOUR = 3600
W0 = BASE - (BASE % 3600)


def _append_batch(spark, rows, path, part):
    spark.createDataFrame(rows, schema=EVENTS_RAW_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/{part}")


def _run_stream(spark, src, checkpoint, sink):
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    agg = (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("bucket_s"), "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_late_event_dropped_by_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    checkpoint = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    # run 1: two events in hour-window W0 plus one far-future event that
    # advances the watermark well past W0's end + 10min delay.
    _append_batch(
        spark,
        [
            (1, _ts(BASE + 10), 1, "click", 1.0, "{}"),
            (2, _ts(BASE + 20), 1, "click", 1.0, "{}"),
            (3, _ts(BASE + 5 * HOUR), 1, "click", 1.0, "{}"),
        ],
        src,
        "b0",
    )
    _run_stream(spark, src, checkpoint, sink)

    # run 2 (same checkpoint → watermark restored): a LATE event for W0.
    _append_batch(
        spark, [(4, _ts(BASE + 30), 1, "click", 1.0, "{}")], src, "b1"
    )
    _run_stream(spark, src, checkpoint, sink)

    out = {}
    for r in spark.read.parquet(sink).collect():
        out[r["bucket_s"]] = out.get(r["bucket_s"], 0) + r["n"]
    # W0 flushed once with exactly the two on-time events; the late
    # event neither re-emitted nor inflated the window.
    assert out.get(W0) == 2, out
