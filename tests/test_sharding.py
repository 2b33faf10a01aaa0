"""operators.sharding — distributed prefix-sum shard packing must equal
the naive global-window formulation (DuckDB twin), stay deterministic,
and respect the budget envelope."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.sharding import (
    assign_token_shards,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 2000


def _spark_shards(spark, n_buckets=7):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    out = assign_token_shards(
        docs, BUDGET, token_col="n_tokens", n_buckets=n_buckets
    )
    return {
        r["doc_id"]: (r["start_offset"], r["shard"]) for r in out.collect()
    }


def test_matches_duckdb_global_cumsum(spark):
    got = _spark_shards(spark)
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT doc_id,
                   CAST(COALESCE(SUM(len(string_split_regex(text, '\\s+')))
                        OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
                   CAST(COALESCE(SUM(len(string_split_regex(text, '\\s+')))
                        OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) // {BUDGET} AS BIGINT)
                     AS shard
            FROM read_parquet('{SF}/documents.parquet')
            """
        ).fetchall()
    }
    assert got == want


def test_bucket_count_does_not_change_layout(spark):
    # the parallelism knob must be invisible in the output
    assert _spark_shards(spark, n_buckets=3) == _spark_shards(
        spark, n_buckets=64
    )


def test_budget_envelope_and_contiguity(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["shard"])
        for r in assign_token_shards(docs, BUDGET).collect()
    )
    shards = [s for _, _, s in rows]
    assert shards == sorted(shards), "shard ids must be monotone in doc_id"
    max_doc = max(n for _, n, _ in rows)
    totals: dict[int, int] = {}
    for _, n, s in rows:
        totals[s] = totals.get(s, 0) + n
    # every shard's total stays within budget + one document (a doc
    # starting before the boundary finishes its shard past it); every
    # shard but the last is filled to at least the budget minus one doc.
    last = max(totals)
    for s, tot in totals.items():
        assert tot <= BUDGET + max_doc, (s, tot)
        if s != last:
            assert tot >= BUDGET - max_doc, (s, tot)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert assign_token_shards(empty, 100).count() == 0


def test_bad_budget(spark):
    docs = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        assign_token_shards(docs, 0)
