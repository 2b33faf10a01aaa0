"""Streaming session windows (session_window + watermark) must finalize
to the same sessions as the batch form."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.plans.events import (
    events_user_sessions,
)
from sports_stats_data_pipeline_spark.plans.relational import cents
from sports_stats_data_pipeline_spark.streaming.pipeline import (
    read_events_stream,
)

SF = "/root/testdata/sf0.001"


def test_streaming_session_windows_match_batch(spark):
    stream = read_events_stream(spark, SF)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("value_c"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "value_c",
        )
    )
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    # session windows only stream in append mode: a window is emitted
    # once the watermark passes its end. At end-of-stream the terminal
    # watermark is max(ts) - delay, so sessions ending inside the last
    # minute are (correctly) withheld — compare with that margin.
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = set(map(tuple, spark.table(sink).collect()))
    batch = set(map(tuple, events_user_sessions(spark, SF).collect()))

    from sports_stats_data_pipeline_spark.sources.tables import load_table

    max_us = (
        load_table(spark, SF, "events")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()[0]["m"]
    )
    # exactness: everything emitted must be a real (batch) session
    assert streamed <= batch
    # completeness: all sessions safely below the terminal watermark
    # (2-minute margin over the 1-minute delay) must have been emitted
    finalized = {s for s in batch if s[2] < max_us - 120_000_000}
    assert finalized <= streamed
    assert len(streamed) > 0.9 * len(batch)


def test_flush_event_gives_exact_batch_parity(spark):
    from sports_stats_data_pipeline_spark.streaming.pipeline import (
        streaming_user_sessions_exact,
    )

    streamed = set(
        map(tuple, streaming_user_sessions_exact(spark, SF).collect())
    )
    batch = set(map(tuple, events_user_sessions(spark, SF).collect()))
    # the end-of-stream flush advances the watermark past every real
    # session: append-mode output is now EXACTLY the batch result, no
    # withheld-tail margin needed.
    assert streamed == batch
