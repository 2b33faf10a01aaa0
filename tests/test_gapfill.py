"""operators.gapfill — hand-computed fill semantics, in-bucket latest-
wins, leading-NULL contract, and a DuckDB twin over the real events
table."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.gapfill import resample_ffill
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.datetime.utcfromtimestamp(s)


def test_hand_computed_fill(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(100), 10.0),
            (1, _ts(125), 12.0),   # same bucket as 120? no: bucket 120
            (1, _ts(190), 19.0),
            (2, _ts(130), 99.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        (r["user_id"], r["bucket_s"]): (r["value"], r["observed"])
        for r in resample_ffill(
            ev, "user_id", "ts", "value", step_s=30, start_s=90, end_s=210
        ).collect()
    }
    # key 1: bucket 90 has obs@100 -> 10; 120 has obs@125 -> 12;
    # 150 filled 12; 180 has obs@190 -> 19; 210 filled 19.
    assert out[(1, 90)] == (10.0, 1)
    assert out[(1, 120)] == (12.0, 1)
    assert out[(1, 150)] == (12.0, 0)
    assert out[(1, 180)] == (19.0, 1)
    assert out[(1, 210)] == (19.0, 0)
    # key 2: leading buckets before first obs stay NULL
    assert out[(2, 90)] == (None, 0)
    assert out[(2, 120)] == (99.0, 1)
    assert out[(2, 210)] == (99.0, 0)
    # full grid for every key
    assert len(out) == 2 * 5


def test_in_bucket_latest_wins_and_validation(spark):
    ev = spark.createDataFrame(
        [(1, _ts(100), 1.0), (1, _ts(110), 2.0), (1, _ts(105), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = resample_ffill(
        ev, "user_id", "ts", "value", step_s=60, start_s=60, end_s=120
    ).collect()
    by_bucket = {r["bucket_s"]: r["value"] for r in out}
    assert by_bucket[60] == 2.0  # ts=110 is latest in [60,120)
    with pytest.raises(ValueError):
        resample_ffill(ev, "user_id", "ts", "value", step_s=0)


def test_matches_duckdb_twin_on_events(spark):
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts", "value")
    )
    step, lo, hi = 86400, 1704067200, 1704067200 + 6 * 86400
    got = sorted(
        (r["user_id"], r["bucket_s"],
         None if r["value"] is None else round(r["value"], 6), r["observed"])
        for r in resample_ffill(
            ev, "user_id", "ts", "value", step_s=step, start_s=lo, end_s=hi
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH ev AS (
              -- epoch_us // 1e6 truncates like Spark's unix_timestamp
              -- (CAST(epoch(ts) AS BIGINT) would ROUND — playbook trap)
              SELECT user_id,
                     CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s, value
              FROM events WHERE user_id < 20
            ),
            obs AS (
              -- struct max mirrors Spark's max(struct(s, v)): latest
              -- second wins, value breaks same-second ties
              SELECT user_id, s - (s % {step}) AS bucket_s,
                     (max(struct_pack(s := s, v := value))).v AS value,
                     1 AS observed
              FROM ev GROUP BY 1, 2
            ),
            grid AS (
              SELECT DISTINCT user_id, g.bucket_s
              FROM ev, (SELECT unnest(range({lo}, {hi} + 1, {step}))
                        AS bucket_s) g
            ),
            merged AS (
              SELECT g.user_id, g.bucket_s, o.value,
                     COALESCE(o.observed, 0) AS observed
              FROM grid g LEFT JOIN obs o
                ON o.user_id = g.user_id AND o.bucket_s = g.bucket_s
              UNION ALL
              SELECT user_id, bucket_s, value, observed FROM obs
              WHERE bucket_s < {lo} OR bucket_s > {hi}
            ),
            filled AS (
              SELECT user_id, bucket_s,
                     LAST_VALUE(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY bucket_s, observed
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS value,
                     observed
              FROM merged
            )
            SELECT user_id, bucket_s,
                   CASE WHEN value IS NULL THEN NULL
                        ELSE round(value, 6) END AS value,
                   CAST(observed AS INTEGER) AS observed
            FROM filled
            WHERE bucket_s BETWEEN {lo} AND {hi}
            """
        ).fetchall()
    )
    assert got == want
