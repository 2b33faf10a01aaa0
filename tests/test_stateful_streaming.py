"""applyInPandasWithState: state must accumulate across micro-batches
and the final per-user profile must equal the batch ground truth."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.plans.relational import cents
from sports_stats_data_pipeline_spark.sources.tables import load_table
from sports_stats_data_pipeline_spark.streaming.pipeline import (
    EVENTS_RAW_SCHEMA,
)
from sports_stats_data_pipeline_spark.streaming.stateful import (
    user_profile_stream,
)

SF = "/root/testdata/sf0.001"


def test_stateful_profile_across_batches(spark, tmp_path):
    # split events into two files so maxFilesPerTrigger=1 yields two
    # micro-batches -> state genuinely crosses a batch boundary.
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/part0")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src + "/part1")

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
    )

    sink = f"profiles_{uuid.uuid4().hex[:8]}"
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per user per batch it appeared in; the
    # final state is the row with the max n_events per user.
    final = (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("value_c").alias("value_c"),
        )
    )
    truth = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_c"),
    )
    got = {r["user_id"]: (r["n_events"], r["value_c"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["value_c"]) for r in truth.collect()}
    assert got == want


def test_transformwithstate_twin_matches_legacy_api(spark, tmp_path):
    """Round 6: the SAME profile operator on Spark 4's
    transformWithStateInPandas (named state variables, RocksDB-native
    — requires the provider session.py pins). Where the protobuf
    package exists the twin must produce the IDENTICAL final per-user
    profiles as the applyInPandasWithState form on the same
    two-micro-batch stream; where it doesn't (this container), the
    operator must fail FAST with the NAMED ImportError instead of the
    opaque mid-query streaming-worker crash it guards against."""
    import uuid as _uuid

    import pytest as _pytest

    from sports_stats_data_pipeline_spark.streaming.stateful import (
        _has_protobuf,
        user_profile_stream_tws,
    )

    if not _has_protobuf():
        df = load_table(spark, SF, "events")
        with _pytest.raises(ImportError, match="protobuf"):
            user_profile_stream_tws(df)
        return

    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/part0")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src + "/part1")

    def run(fn):
        stream = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .load(src)
        )
        sink = f"profiles_{_uuid.uuid4().hex[:8]}"
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["user_id"]: (r["n_events"], r["value_c"], r["last_event_id"])
            for r in spark.table(sink)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("value_c").alias("value_c"),
                F.max("last_event_id").alias("last_event_id"),
            )
            .collect()
        }

    legacy = run(user_profile_stream)
    tws = run(user_profile_stream_tws)
    assert tws == legacy and len(tws) > 10
