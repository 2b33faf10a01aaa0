"""small_file_report: fragmentation stats + recommendation thresholds."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.maintenance import (
    small_file_report,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_fragmented_table_flagged(spark, tmp_path):
    out = str(tmp_path / "frag")
    load_table(spark, SF_SMOKE, "orders").repartition(16).write.parquet(out)
    rep = small_file_report(out)  # 16 tiny files vs 128 MiB target
    assert rep["n_files"] == 16
    assert rep["n_small"] == 16 and rep["small_fraction_bp"] == 10_000
    assert rep["recommend_compaction"] is True
    assert rep["p50_bytes"] <= rep["max_bytes"]


def test_healthy_single_file_not_flagged(spark, tmp_path):
    out = str(tmp_path / "one")
    load_table(spark, SF_SMOKE, "orders").coalesce(1).write.parquet(out)
    # one file: never worth a rewrite regardless of size
    rep = small_file_report(out, target_bytes=1024)
    assert rep["n_files"] == 1
    assert rep["recommend_compaction"] is False


def test_empty_dir(tmp_path):
    rep = small_file_report(str(tmp_path))
    assert rep["n_files"] == 0 and rep["recommend_compaction"] is False
