"""Table diff / reconciliation (operators/diff.py): hand-computed
statuses, null-safe semantics, column subsetting, summary 0-fill, and a
DuckDB twin on mutated real orders."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.diff import (
    diff_summary,
    table_diff,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _diff_map(d):
    return {
        r["k"]: (r["diff_status"], sorted(r["changed_cols"]))
        for r in d.collect()
    }


def test_statuses_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    right = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 41), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = _diff_map(table_diff(left, right, ["k"]))
    assert got == {
        1: ("unchanged", []),
        2: ("changed", ["s"]),
        3: ("removed", []),
        4: ("changed", ["v"]),   # NULL == NULL on s, v differs
        5: ("added", []),
    }


def test_null_transitions_are_changes(spark):
    left = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
    right = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    got = _diff_map(table_diff(left, right, ["k"]))
    assert got == {1: ("changed", ["s"]), 2: ("changed", ["s"])}


def test_compare_cols_subset_and_one_sided_ignored(spark):
    left = spark.createDataFrame(
        [(1, "a", 1, "only_left")], "k long, s string, v long, extra string"
    )
    right = spark.createDataFrame(
        [(1, "a", 99)], "k long, s string, v long"
    )
    # default: one-sided 'extra' ignored, v compared -> changed
    assert _diff_map(table_diff(left, right, ["k"]))[1] == (
        "changed", ["v"],
    )
    # explicit subset skipping v -> unchanged
    assert _diff_map(table_diff(left, right, ["k"], ["s"]))[1] == (
        "unchanged", [],
    )


def test_summary_zero_fill(spark):
    left = spark.createDataFrame([(1, "a")], "k long, s string")
    d = table_diff(left, left, ["k"])
    got = {
        (r["kind"], r["name"]): r["n"] for r in diff_summary(d).collect()
    }
    assert got == {
        ("status", "added"): 0,
        ("status", "removed"): 0,
        ("status", "changed"): 0,
        ("status", "unchanged"): 1,
    }


def test_duckdb_twin_on_mutated_orders(spark):
    """Old = orders; new = orders with a deterministic mutation mix
    (price bump on custkey%97, status flip on orderkey%101, deletes on
    orderkey%89, inserted keys). Full status+column summary twin."""
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter(F.col("o_orderkey") % 89 != 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.lit("X")
            ).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(
                F.col("o_custkey") % 97 == 0,
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            orders.limit(0).unionByName(
                spark.createDataFrame(
                    [(10_000_001, 1, "O", 1.0), (10_000_002, 2, "F", 2.0)],
                    "o_orderkey long, o_custkey long, "
                    "o_orderstatus string, o_totalprice double",
                )
            )
        )
    )
    got = {
        (r["kind"], r["name"]): r["n"]
        for r in diff_summary(
            table_diff(orders, new, ["o_orderkey"])
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF}/orders.parquet')"
    )
    exp_rows = con.execute("""
        WITH old AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM orders
        ), new AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                      ELSE o_orderstatus END AS o_orderstatus,
                 CASE WHEN o_custkey % 97 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 89 <> 0
          UNION ALL
          SELECT * FROM (VALUES (10000001, 1, 'O', 1.0),
                                (10000002, 2, 'F', 2.0))
        ), j AS (
          SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                 o.o_orderkey IS NOT NULL AS in_l,
                 n.o_orderkey IS NOT NULL AS in_r,
                 o.o_custkey IS DISTINCT FROM n.o_custkey AS c_cust,
                 o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS c_st,
                 o.o_totalprice IS DISTINCT FROM n.o_totalprice AS c_tp
          FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        )
        SELECT 'status' AS kind,
               CASE WHEN NOT in_l THEN 'added'
                    WHEN NOT in_r THEN 'removed'
                    WHEN c_cust OR c_st OR c_tp THEN 'changed'
                    ELSE 'unchanged' END AS name,
               COUNT(*) AS n
        FROM j GROUP BY 2
        UNION ALL
        SELECT 'column', col, COUNT(*) FROM (
          SELECT 'o_custkey' AS col FROM j WHERE in_l AND in_r AND c_cust
          UNION ALL
          SELECT 'o_orderstatus' FROM j WHERE in_l AND in_r AND c_st
          UNION ALL
          SELECT 'o_totalprice' FROM j WHERE in_l AND in_r AND c_tp
        ) GROUP BY 2
    """).fetchall()
    exp = {(k, n): int(c) for (k, n, c) in exp_rows}
    # spark side 0-fills statuses; fill the twin the same way
    for s in ("added", "removed", "changed", "unchanged"):
        exp.setdefault(("status", s), 0)
    assert got == exp
    assert got[("status", "added")] == 2
    assert got[("status", "removed")] > 0
    assert got[("status", "changed")] > 0
