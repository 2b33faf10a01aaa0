"""Cohort retention (operators/cohort.py): hand-computed triangle,
offset-0 invariant, and a DuckDB twin on the real events table."""

from __future__ import annotations

import duckdb
import pytest

from sports_stats_data_pipeline_spark.operators.cohort import (
    cohort_retention,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hand_computed_weekly_triangle(spark):
    # 2024-01-01 and 2024-01-08 are Mondays
    rows = [
        (1, "2024-01-01 10:00:00"),  # cohort W1
        (1, "2024-01-09 10:00:00"),  # W2 -> offset 1
        (2, "2024-01-03 10:00:00"),  # cohort W1
        (3, "2024-01-08 10:00:00"),  # cohort W2
        (3, "2024-01-22 10:00:00"),  # W4 -> offset 2
        (2, "2024-01-04 11:00:00"),  # same period, no extra row
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", __import__("pyspark.sql.functions", fromlist=["F"]).col(
            "s"
        ).cast("timestamp").alias("ts"),
    )
    got = {
        (r["cohort"], r["period_offset"]): (
            r["active_users"], r["cohort_size"], r["retention_bp"],
        )
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 10000),
        ("2024-01-01", 1): (1, 2, 5000),
        ("2024-01-08", 0): (1, 1, 10000),
        ("2024-01-08", 2): (1, 1, 10000),
    }


def test_offset_zero_is_full_retention(spark):
    events = load_table(spark, SF, "events")
    out = cohort_retention(events).persist()
    zero = out.filter("period_offset = 0").collect()
    assert zero
    for r in zero:
        assert r["active_users"] == r["cohort_size"]
        assert r["retention_bp"] == 10000
    out.unpersist()


def test_validation():
    with pytest.raises(ValueError, match="period"):
        cohort_retention(None, period="month")


def test_duckdb_twin_on_events(spark):
    events = load_table(spark, SF, "events")
    got = {
        (r["cohort"], r["period_offset"]): (
            r["active_users"], r["cohort_size"], r["retention_bp"],
        )
        for r in cohort_retention(events).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp_rows = con.execute("""
        WITH ev AS (
          SELECT user_id AS u, date_trunc('week', ts) AS p FROM events
        ), first AS (
          SELECT u, MIN(p) AS cp FROM ev GROUP BY u
        ), sizes AS (
          SELECT cp, COUNT(DISTINCT u) AS cs FROM first GROUP BY cp
        ), active AS (
          SELECT cp, datediff('day', cp, p) // 7 AS off,
                 COUNT(DISTINCT e.u) AS au
          FROM ev e JOIN first f ON e.u = f.u
          GROUP BY 1, 2
        )
        SELECT strftime(a.cp, '%Y-%m-%d'), a.off, a.au, s.cs,
               (10000 * a.au) // s.cs
        FROM active a JOIN sizes s ON a.cp = s.cp
    """).fetchall()
    exp = {
        (c, int(o)): (int(au), int(cs), int(bp))
        for (c, o, au, cs, bp) in exp_rows
    }
    assert got == exp and got


def test_null_user_or_ts_rows_dropped(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, None),
        (None, "2024-01-02 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    out = cohort_retention(df).collect()
    assert [(r["cohort"], r["period_offset"], r["active_users"]) for r in out] == [
        ("2024-01-01", 0, 1)
    ]
