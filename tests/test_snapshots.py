"""Snapshot store: time travel, append composition, atomic-visibility
(crash before manifest publish = invisible), vacuum retention, and the
single-writer race guard."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.snapshots import (
    list_snapshots,
    read_snapshot,
    vacuum_snapshots,
    write_snapshot,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _orders(spark, lo, hi):
    return (
        load_table(spark, SF_SMOKE, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def test_time_travel_reads_each_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    a, b = _orders(spark, 0, 100), _orders(spark, 0, 300)
    assert write_snapshot(a, t) == 1
    assert write_snapshot(b, t) == 2
    v1 = read_snapshot(spark, t, 1)
    v2 = read_snapshot(spark, t, 2)
    latest = read_snapshot(spark, t)
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, a.collect()))
    assert sorted(map(tuple, v2.collect())) == sorted(map(tuple, b.collect()))
    assert v2.count() == latest.count()
    metas = list_snapshots(t)
    assert [m["version"] for m in metas] == [1, 2]
    assert metas[0]["count"] == a.count()


def test_append_mode_composes_without_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    a, b = _orders(spark, 0, 100), _orders(spark, 100, 200)
    write_snapshot(a, t)
    v2 = write_snapshot(b, t, mode="append")
    got = read_snapshot(spark, t, v2)
    want = a.unionByName(b)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # v1's data files are REFERENCED, not copied: v2 manifest covers
    # both data dirs, and v1 still reads standalone
    metas = {m["version"]: m for m in list_snapshots(t)}
    assert metas[2]["count"] == a.count() + b.count()
    assert read_snapshot(spark, t, 1).count() == a.count()


def test_uncommitted_data_is_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_orders(spark, 0, 100), t)
    # simulate a crash AFTER data write, BEFORE manifest publish
    ghost = os.path.join(t, "data", "v2")
    _orders(spark, 100, 200).write.parquet(ghost)
    assert [m["version"] for m in list_snapshots(t)] == [1]
    assert read_snapshot(spark, t).count() == _orders(spark, 0, 100).count()
    rep = vacuum_snapshots(t, keep_last=5)
    assert rep["removed_dirs"] == [os.path.join(t, "data", "v2")]
    assert not os.path.exists(ghost)


def test_vacuum_retention(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        write_snapshot(_orders(spark, lo, lo + 100), t)
    rep = vacuum_snapshots(t, keep_last=1)
    assert rep["dropped_versions"] == [1, 2]
    assert len(rep["removed_dirs"]) == 2
    assert [m["version"] for m in list_snapshots(t)] == [3]
    assert read_snapshot(spark, t).count() == _orders(spark, 200, 300).count()
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)


def test_vacuum_append_chain_keeps_referenced_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_orders(spark, 0, 100), t)
    write_snapshot(_orders(spark, 100, 200), t, mode="append")
    write_snapshot(_orders(spark, 200, 300), t, mode="append")
    # keeping only v3 must keep ALL data dirs (v3 references v1+v2 files)
    rep = vacuum_snapshots(t, keep_last=1)
    assert rep["dropped_versions"] == [1, 2] and rep["removed_dirs"] == []
    assert read_snapshot(spark, t).count() == _orders(spark, 0, 300).count()


def test_writer_race_guard_and_bad_args(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_orders(spark, 0, 100), t)
    with pytest.raises(ValueError):
        write_snapshot(_orders(spark, 0, 100), t, mode="merge")
    with pytest.raises(ValueError):
        vacuum_snapshots(t, keep_last=0)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))

def test_append_schema_mismatch_refused(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_orders(spark, 0, 100), t)
    other = _orders(spark, 100, 200).withColumnRenamed(
        "o_totalprice", "price"
    )
    with pytest.raises(ValueError, match="append schema mismatch"):
        write_snapshot(other, t, mode="append")
    # the refused batch's data dir was cleaned up; v1 still reads
    assert [m["version"] for m in list_snapshots(t)] == [1]
    assert read_snapshot(spark, t).count() == _orders(spark, 0, 100).count()
