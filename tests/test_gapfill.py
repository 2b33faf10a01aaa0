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


def test_per_key_default_bounds(spark):
    # key 1 spans 100..190, key 2 has one ancient obs at 130 PLUS one
    # far-future at 10_000; under per-key bounds key 1's grid must NOT
    # stretch to 10_000
    ev = spark.createDataFrame(
        [
            (1, _ts(100), 10.0),
            (1, _ts(190), 19.0),
            (2, _ts(130), 99.0),
            (2, _ts(10_000), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = resample_ffill(ev, "user_id", "ts", "value", step_s=30).collect()
    k1 = sorted(r["bucket_s"] for r in rows if r["user_id"] == 1)
    assert k1 == [90, 120, 150, 180]  # key 1's own span only
    k2 = [r["bucket_s"] for r in rows if r["user_id"] == 2]
    assert min(k2) == 120 and max(k2) == 9990
    # first bucket of each key is observed (grid starts at first obs)
    filled = {
        (r["user_id"], r["bucket_s"]): (r["value"], r["observed"])
        for r in rows
    }
    assert filled[(1, 90)][1] == 1 and filled[(2, 120)][1] == 1
    # carry-forward still fills interior gaps
    assert filled[(1, 150)] == (10.0, 0)
    assert filled[(2, 5010)] == (99.0, 0)


def test_max_buckets_guard(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(100_000), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="max_buckets"):
        resample_ffill(
            ev, "user_id", "ts", "value", step_s=1, max_buckets=1000
        )
    with pytest.raises(ValueError, match="max_buckets"):
        resample_ffill(
            ev, "user_id", "ts", "value", step_s=1,
            start_s=0, end_s=100_000, max_buckets=1000,
        )
    # under the cap: fine
    assert (
        resample_ffill(
            ev, "user_id", "ts", "value", step_s=100_000, max_buckets=1000
        ).count()
        == 2
    )


def test_empty_input_schema_derives_from_events(spark):
    # string key + decimal-ish value: the empty global path must carry
    # the INPUT's types, not a hardcoded long/double
    ev = spark.createDataFrame(
        [], "name string, ts timestamp, value float"
    )
    out = resample_ffill(
        ev, "name", "ts", "value", step_s=60, bounds="global"
    )
    assert out.count() == 0
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string", "bigint", "float", "int"
    ]
    # per-key empty path produces the same shape distributedly
    out2 = resample_ffill(ev, "name", "ts", "value", step_s=60)
    assert out2.count() == 0
    assert [f.name for f in out2.schema.fields] == [
        f.name for f in out.schema.fields
    ]
