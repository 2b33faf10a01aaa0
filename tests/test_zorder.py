"""Z-order clustering: the Morton key matches a python bit-interleave
reference, and a z-ordered layout gives every file a small rectangle in
BOTH dimensions where a single-column sort scatters the other one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.zorder import (
    write_zordered,
    zorder_key,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _morton_ref(vals, bounds, bits):
    """Python reference: scale each value to the grid, interleave bits
    LSB-first with column 0 in the highest lane."""
    n = len(vals)
    grids = []
    for v, (lo, hi) in zip(vals, bounds):
        if hi <= lo:
            grids.append(0)
            continue
        g = int((v - lo) / (hi - lo) * (1 << bits))
        grids.append(max(0, min((1 << bits) - 1, g)))
    key = 0
    for ci, g in enumerate(grids):
        for j in range(bits):
            key |= ((g >> j) & 1) << (j * n + (n - 1 - ci))
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(0.0, 0.0), (100.0, 50.0), (37.0, 12.5), (99.9, 0.1), (50.0, 25.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    bounds = {"x": (0.0, 100.0), "y": (0.0, 50.0)}
    got = (
        df.withColumn("z", zorder_key(df, ["x", "y"], 8, bounds=bounds))
        .orderBy("x")
        .collect()
    )
    for r in got:
        ref = _morton_ref(
            [r["x"], r["y"]], [bounds["x"], bounds["y"]], 8
        )
        assert r["z"] == ref, (r["x"], r["y"])


def test_zorder_key_validation_and_degenerate_bounds(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(df, ["x", "y"], bits_per_col=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    # constant column: grid collapses to 0, key is driven by the other
    const = spark.createDataFrame(
        [(5.0, 1.0), (5.0, 2.0)], "x double, y double"
    )
    z = const.withColumn("z", zorder_key(const, ["x", "y"], 8)).collect()
    assert all(r["z"] >= 0 for r in z)


def _file_rects(spark, path, a, b):
    """Per-file (min, max) of both columns, normalized to [0,1] spans."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    stats = (
        df.groupBy("f")
        .agg(
            F.min(F.col(a).cast("double")).alias("alo"),
            F.max(F.col(a).cast("double")).alias("ahi"),
            F.min(F.col(b).cast("double")).alias("blo"),
            F.max(F.col(b).cast("double")).alias("bhi"),
        )
        .collect()
    )
    g = df.agg(
        F.min(F.col(a).cast("double")).alias("alo"),
        F.max(F.col(a).cast("double")).alias("ahi"),
        F.min(F.col(b).cast("double")).alias("blo"),
        F.max(F.col(b).cast("double")).alias("bhi"),
    ).first()
    aspan, bspan = g["ahi"] - g["alo"], g["bhi"] - g["blo"]
    fracs = [
        ((r["ahi"] - r["alo"]) / aspan, (r["bhi"] - r["blo"]) / bspan)
        for r in stats
    ]
    mean_a = sum(f[0] for f in fracs) / len(fracs)
    mean_b = sum(f[1] for f in fracs) / len(fracs)
    return len(fracs), mean_a, mean_b


def test_zordered_files_are_tight_in_both_dims(spark, tmp_path):
    events = load_table(spark, SF, "events").select("user_id", "ts", "value")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(events, zpath, ["user_id", "ts"], n_files=8)
    # baseline: plain sort on user_id only
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    zn, z_user, z_ts = _file_rects(spark, zpath, "user_id", "ts")
    sn, s_user, s_ts = _file_rects(spark, spath, "user_id", "ts")
    assert zn >= 4 and sn >= 4
    # single-column sort: tight on user, but every file spans ~all of ts
    assert s_user < 0.5
    assert s_ts > 0.9
    # z-order: materially tight on BOTH dimensions
    assert z_user < 0.75
    assert z_ts < 0.75


def test_partitioned_zorder_layers_both_prunings(spark, tmp_path):
    """Date directories + z-order within: date predicates prune
    PARTITIONS (PartitionFilters), and within each date directory the
    files stay tight on the z-ordered columns."""
    events = load_table(spark, SF, "events").select(
        "user_id", "ts", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    path = str(tmp_path / "pz")
    write_zordered(
        events, path, ["user_id", "value"], n_files=16,
        partition_by=["day"],
    )
    back = spark.read.parquet(path)
    # directory layout: one dir per day
    days = {r["day"] for r in events.select("day").distinct().collect()}
    import os

    dirs = {d.split("=")[1] for d in os.listdir(path) if d.startswith("day=")}
    assert dirs == days
    # date predicate prunes partitions, not data rows
    from sports_stats_data_pipeline_spark.plans.lint import plan_text

    one_day = sorted(days)[0]
    p = plan_text(back.filter(F.col("day") == one_day))
    assert "PartitionFilters" in p and f"{one_day}" in p
    # inside a single day, files are tight on user_id (the z axis 1)
    day_path = os.path.join(path, f"day={one_day}")
    n, u_frac, v_frac = _file_rects(spark, day_path, "user_id", "value")
    if n >= 3:  # enough files in the day to measure spread
        assert u_frac < 0.9
