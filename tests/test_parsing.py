"""Unit tests for the silver-layer parsers (functions.parsing) against
FIXTURES.md §A3 expectations — denser edge coverage than the driver-facing
VALUES queries."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.functions.parsing import (
    activity_flag,
    dispatch_label,
    nullify_na,
    parse_height_cm,
    parse_mmss_seconds,
    parse_of_pair,
    parse_pct,
    parse_record,
    parse_ref_date,
    parse_scheduled_rounds,
    parse_weight_kg,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], schema="v string")
    return df.select(expr(F.col("v")).alias("out")).collect()[0]["out"]


def test_record_three_and_two_part(spark):
    df = spark.createDataFrame(
        [("28-1-0",), ("15-3",), (None,), ("x",), ("Record: 9-0-0",)],
        schema="v string",
    )
    w, l, d = parse_record(F.col("v"))
    rows = df.select(w.alias("w"), l.alias("l"), d.alias("d")).collect()
    assert [tuple(r) for r in rows] == [
        (28, 1, 0),
        (15, 3, None),
        (None, None, None),
        (None, None, None),
        (9, 0, 0),
    ]


def test_height_weight_reach(spark):
    assert _one(spark, "5' 11\"", parse_height_cm) == (5 * 12 + 11) * 2.54
    assert _one(spark, "155 lbs.", parse_weight_kg) == 155 * 0.45359237
    assert _one(spark, "garbage", parse_height_cm) is None


def test_pct_bounds(spark):
    assert _one(spark, "0%", parse_pct) == 0.0
    assert _one(spark, "100%", parse_pct) == 1.0
    assert _one(spark, "N/A", parse_pct) is None


def test_date_format_trailing_dot_nonpadded(spark):
    assert _one(spark, "Jul. 9, 1987", parse_ref_date) == datetime.date(
        1987, 7, 9
    )
    assert _one(spark, "Feb. 29, 2000", parse_ref_date) == datetime.date(
        2000, 2, 29
    )
    assert _one(spark, "Feb. 30, 2001", parse_ref_date) is None
    assert _one(spark, "2001-01-01", parse_ref_date) is None


def test_of_pair_and_mmss(spark):
    df = spark.createDataFrame([("45 of 112",)], schema="v string")
    landed, att = parse_of_pair(F.col("v"))
    row = df.select(landed.alias("l"), att.alias("a")).collect()[0]
    assert (row["l"], row["a"]) == (45, 112)
    assert _one(spark, "3:42", parse_mmss_seconds) == 222
    assert _one(spark, "61:05", parse_mmss_seconds) == 3665
    assert _one(spark, "4:5", parse_mmss_seconds) is None


def test_scheduled_rounds_and_labels(spark):
    assert _one(spark, "5 Rnd (5-5-5-5-5)", parse_scheduled_rounds) == 5
    assert _one(spark, "No Time Limit", parse_scheduled_rounds) is None
    # precedence: 'round' must not swallow 'time', 'time format' (X8)
    assert _one(spark, "Round:", dispatch_label) == "round"
    assert _one(spark, "Time:", dispatch_label) == "time"
    assert _one(spark, "Time format:", dispatch_label) == "time_format"
    assert _one(spark, "Method:", dispatch_label) == "method"
    assert _one(spark, "Referee:", dispatch_label) is None


def test_na_sentinel(spark):
    assert _one(spark, "N/A", nullify_na) is None
    assert _one(spark, "", nullify_na) is None
    assert _one(spark, "ok", nullify_na) == "ok"


def test_activity_flag_boundary(spark):
    # as_of 2026-08-13: exactly 730 days earlier = 2024-08-14 -> Active;
    # one day before that -> 731/365 > 2 -> Inactive.
    df = spark.createDataFrame(
        [("Aug. 14, 2024",), ("Aug. 12, 2024",), (None,)], schema="v string"
    )
    out = df.select(
        activity_flag(parse_ref_date(F.col("v")), "2026-08-13").alias("s")
    ).collect()
    assert [r["s"] for r in out] == ["Active", "Inactive", "Inactive"]


def test_normalize_text_matches_duckdb_twin(spark):
    """Dedup normalization: hand anchors + bit-identical DuckDB twin on
    the real documents table."""
    import duckdb

    from sports_stats_data_pipeline_spark.functions.text import (
        normalize_text,
        sql_normalize_text,
    )
    from sports_stats_data_pipeline_spark.sources.tables import load_table

    anchors = spark.createDataFrame(
        [
            ("  Héllo,   WORLD!! 123 items ", "hello world 0 items"),
            ("Ça va très bien –№42", "ca va tres bien 0"),
            ("", ""),
        ],
        "text string, want string",
    )
    for r in anchors.select(
        normalize_text("text").alias("got"), "want"
    ).collect():
        assert r["got"] == r["want"]

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", normalize_text("text").alias("n")
        ).collect()
    }
    con = duckdb.connect()
    ref = dict(
        con.execute(
            f"SELECT doc_id, {sql_normalize_text('text')} FROM "
            f"read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    )
    assert got == ref
