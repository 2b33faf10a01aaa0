"""Bucketed co-located join: the write-once-shuffle-never contract must
hold in the physical plan (no Exchange on the bucketed join)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=4)
    write_bucketed(li, "lineitem_b", ["o_orderkey"], n_buckets=4)

    # disable auto-broadcast: at tiny SF the planner would broadcast and
    # ignore bucketing; the contract under test is the 100 TB fact⋈fact
    # path, where both sides are too big to broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "orders_b", "lineitem_b", on=["o_orderkey"]
        )
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed equi-join still shuffles:\n" + plan
    )

    # and it computes the right thing
    expected = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
