"""Plan-audit API: the checks fire on plans that genuinely have the
property and raise (with the plan attached) on plans that don't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.plans.lint import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_max_shuffles,
    assert_no_shuffle,
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    scan_count,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_map_only_projection_has_no_shuffle(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    assert_no_shuffle(docs)
    assert scan_count(docs) == 1


def test_groupby_counts_exactly_one_shuffle(spark):
    agg = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert exchange_count(agg) == 1
    assert_max_shuffles(agg, 1)
    with pytest.raises(AssertionError, match="Exchange"):
        assert_no_shuffle(agg)


def test_broadcast_and_pushdown_detected(spark):
    orders = load_table(spark, SF, "orders").filter(
        F.col("o_orderdate") >= "1997-01-01"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_mktsegment")
    assert broadcast_join_count(j) >= 1
    assert_broadcast_join(j)
    assert_filter_pushed(j, "o_orderdate")
    assert any("o_orderdate" in p for p in pushed_filters(j))
    with pytest.raises(AssertionError, match="no scan pushes"):
        assert_filter_pushed(j, "no_such_column")


def test_column_pruning_audit(spark):
    two_cols = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey"
    )
    assert_columns_pruned(two_cols, 2)
    with pytest.raises(AssertionError, match="columns"):
        assert_columns_pruned(load_table(spark, SF, "orders"), 2)
