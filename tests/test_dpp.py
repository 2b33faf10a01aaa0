"""Dynamic partition pruning: joining a date-partitioned fact with a
filtered dimension must prune fact partitions AT RUNTIME from the dim's
build side — the flagship lakehouse scan-killer at 100 TB (a static
planner cannot know which dates survive the dim filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_dpp_fires_on_partitioned_fact_dim_join(spark, tmp_path):
    fact_path = str(tmp_path / "events_by_day")
    e = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("day").parquet(fact_path)
    n_days = e.select("day").distinct().count()

    fact = spark.read.parquet(fact_path)
    # a dim table carrying per-day attributes, WRITTEN OUT (DPP's
    # filter-side heuristics want a selective filter over a scan, not
    # an in-memory relation), filtered on a NON-join column — exactly
    # the shape a static planner cannot prune from
    dim_path = str(tmp_path / "day_dim")
    counts = e.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    cutoff = sorted(r["n"] for r in counts.collect())[-2]  # keep top 2
    counts.write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("n") >= cutoff)
    q = fact.join(dim.select("day"), "day").groupBy("day").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning is real: only the surviving days come back.
    # (Partition-value inference reads the day directory names back as
    # DATE — normalize to ISO strings for the compare.)
    got = {str(r["day"]) for r in q.collect()}
    keep = {str(r["day"]) for r in dim.collect()}
    assert got == keep and len(keep) == 2 < n_days


def test_static_partition_pruning_from_literal_filter(spark, tmp_path):
    # the static sibling: a literal day predicate must prune at plan
    # time (PartitionFilters on the scan), reading one directory
    fact_path = str(tmp_path / "events_by_day2")
    e = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("day").parquet(fact_path)
    some_day = e.select("day").orderBy("day").first()["day"]
    q = spark.read.parquet(fact_path).filter(F.col("day") == some_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan, plan
    assert q.count() == e.filter(F.col("day") == some_day).count()
