"""Partitioned layout + dynamic partition pruning: date-partitioned
parquet must show PartitionFilters (not data filters) for date
predicates — the scan-skipping that makes 100 TB time-range queries
touch only their slice."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_date_partitioned_scan_prunes(spark, tmp_path):
    events = load_table(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    events.write.mode("overwrite").partitionBy("day").parquet(path)

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "day" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0], "day predicate not applied as a partition filter"

    # and pruning is semantically right
    expected = events.filter(F.col("day") == "2024-01-02").count()
    assert back.count() == expected
    assert expected > 0
