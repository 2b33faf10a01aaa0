"""Merge-core semantics (operators.merge): first-wins, idempotence,
column alignment by name — the reference's central guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.merge import (
    first_wins_dedup,
    insert_if_absent,
)


def test_existing_rows_win(spark):
    existing = spark.createDataFrame(
        [("u1", "old")], schema="url string, name string"
    )
    new = spark.createDataFrame(
        [("u1", "NEW"), ("u2", "fresh")], schema="url string, name string"
    )
    out = {
        r["url"]: r["name"]
        for r in insert_if_absent(existing, new, ["url"]).collect()
    }
    assert out == {"u1": "old", "u2": "fresh"}


def test_merge_idempotent(spark):
    existing = spark.createDataFrame(
        [("u1", "a"), ("u2", "b")], schema="url string, name string"
    )
    batch = spark.createDataFrame(
        [("u2", "x"), ("u3", "c")], schema="url string, name string"
    )
    once = insert_if_absent(existing, batch, ["url"])
    twice = insert_if_absent(once, batch, ["url"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_union_aligns_by_name_not_position(spark):
    existing = spark.createDataFrame(
        [("u1", "a")], schema="url string, name string"
    )
    # incoming columns in a different order + an extra column
    new = spark.createDataFrame(
        [("bob", "u9", "x")], schema="name string, url string, extra string"
    )
    out = insert_if_absent(existing, new, ["url"])
    row = {r["url"]: r for r in out.collect()}
    assert row["u9"]["name"] == "bob"
    assert row["u1"]["extra"] is None


def test_first_wins_dedup_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 2, "late"), ("k", 1, "early"), ("j", 1, "only")],
        schema="key string, seq int, v string",
    )
    out = {
        r["key"]: r["v"]
        for r in first_wins_dedup(df, ["key"], ["seq"]).collect()
    }
    assert out == {"k": "early", "j": "only"}


def test_new_batch_internal_dups_collapse(spark):
    existing = spark.createDataFrame([], schema="url string, name string")
    new = spark.createDataFrame(
        [("u1", "a"), ("u1", "b")], schema="url string, name string"
    )
    out = insert_if_absent(existing, new, ["url"])
    assert out.count() == 1
