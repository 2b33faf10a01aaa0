"""Generic as-of join operator: hand-computed expectations including
tie handling, missing-right keys, and strict vs non-strict."""

from __future__ import annotations

from sports_stats_data_pipeline_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 20, "t2"), ("B", 5, "t3"), ("C", 7, "t4")],
        schema="sym string, ts long, trade_id string",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 15, 102.0), ("B", 9, 50.0)],
        schema="sym string, qts long, px double",
    )
    return trades, quotes


def test_asof_strict_excludes_ties(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, "sym", "ts", "qts", ["px"], strict=True
        ).collect()
    }
    # t1 at ts=10: strict -> quote at 10 NOT visible, last is 8 -> 100.0
    assert out == {"t1": 100.0, "t2": 102.0, "t3": None, "t4": None}


def test_asof_nonstrict_includes_ties(spark):
    trades, quotes = _frames(spark)
    out = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, "sym", "ts", "qts", ["px"], strict=False
        ).collect()
    }
    assert out["t1"] == 101.0  # tie at ts=10 now visible
    assert out["t2"] == 102.0


def test_asof_equal_ts_right_rows_have_deterministic_winner(spark):
    # two quotes at the SAME timestamp: without a tiebreak last() is
    # partition-luck; with order_by the larger id wins, deterministically.
    trades = spark.createDataFrame(
        [("A", 10, 100)], schema="sym string, ts long, oid long"
    )
    quotes = spark.createDataFrame(
        [("A", 5, 1, 50.0), ("A", 5, 2, 51.0), ("A", 5, 3, 52.0)],
        schema="sym string, qts long, oid long, px double",
    )
    for _ in range(3):  # stable across repeated plans/partitionings
        out = asof_join(
            trades, quotes, "sym", "ts", "qts", ["px"],
            strict=True, order_by="oid",
        ).collect()
        assert out[0]["asof_px"] == 52.0


def test_asof_strict_with_order_by_is_lexicographic(spark):
    # equal-ts right rows ARE visible to a left row with larger order id
    # (the SQL ORDER BY ts, id ... 1 PRECEDING semantics), and invisible
    # to one with a smaller id.
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 10, 9)], schema="sym string, ts long, oid long"
    )
    quotes = spark.createDataFrame(
        [("A", 10, 5, 77.0)], schema="sym string, qts long, oid long, px double"
    )
    out = {
        r["oid"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, "sym", "ts", "qts", ["px"],
            strict=True, order_by="oid",
        ).collect()
    }
    assert out == {1: None, 9: 77.0}


def test_asof_preserves_left_columns_and_count(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, "sym", "ts", "qts", ["px"], strict=True)
    assert set(out.columns) == {"sym", "ts", "trade_id", "asof_px"}
    assert out.count() == trades.count()
