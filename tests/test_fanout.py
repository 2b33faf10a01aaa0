"""sources.tables._fan_out_small_scan — the round-10 escape hatch for
the single-row-group serial-scan pathology. Contract: fan out ONLY
local-file scans inside the [256 KiB, 8 MiB x cores] window; no-op on
broadcast-tier tables (under the floor), on big tables (Spark's own
split planning), on remote-store URIs, and on any introspection
failure. Value-neutrality is covered by the oracle-parity suite; these
pin the gating logic itself."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from sports_stats_data_pipeline_spark.sources import tables as T


def _parts(df: DataFrame) -> int:
    return df.rdd.getNumPartitions()


def test_window_gating_on_real_tables(spark):
    # sf0.1 documents (~0.6 MB, one row group) sits inside the window
    fanned = T.load_table(
        spark, "/root/testdata/sf0.1", "documents", fan_out=True
    )
    cores = spark.sparkContext.defaultParallelism
    assert _parts(fanned) == cores
    # sf0.001 documents (~6 KB) is under the floor -> untouched scan
    tiny = T.load_table(
        spark, "/root/testdata/sf0.001", "documents", fan_out=True
    )
    assert _parts(tiny) == 1
    # default is opt-in: no fan-out unless the plan asks
    plain = T.load_table(spark, "/root/testdata/sf0.1", "documents")
    assert _parts(plain) == 1


def test_big_local_table_is_left_to_split_planning(spark, monkeypatch):
    monkeypatch.setattr(T, "_FAN_OUT_MAX_BYTES_PER_CORE", 1)
    df = T.load_table(
        spark, "/root/testdata/sf0.1", "documents", fan_out=True
    )
    assert _parts(df) == 1  # above the cap -> no-op


def test_remote_uri_and_failure_are_noops(spark, monkeypatch):
    df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    monkeypatch.setattr(
        type(df),
        "inputFiles",
        lambda self: ["s3://bucket/part-0.parquet"],
    )
    assert T._fan_out_small_scan(df) is df  # remote scheme -> no-op

    def boom(self):
        raise RuntimeError("no plan introspection here")

    monkeypatch.setattr(type(df), "inputFiles", boom)
    assert T._fan_out_small_scan(df) is df  # introspection failure


def test_fan_out_window_matches_file_size(spark, tmp_path):
    # a synthetic local table just above the floor fans out...
    p = str(tmp_path / "wide")
    spark.range(100_000).selectExpr(
        "id", "repeat(uuid(), 2) AS pad"
    ).coalesce(1).write.parquet(p)
    size = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    assert size >= T._FAN_OUT_MIN_BYTES, size
    df = T._fan_out_small_scan(spark.read.parquet(p))
    assert _parts(df) == spark.sparkContext.defaultParallelism
