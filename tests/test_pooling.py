"""Exact vector pooling: hand anchors, partition invariance, NULL
handling, and a DuckDB twin on the real embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.pooling import (
    mean_pool_micro,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_hand_anchor(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 4.0]),
            ("b", [0.5, -0.5]),
            ("b", None),
        ],
        "g string, v array<double>",
    )
    got = {r["g"]: r for r in mean_pool_micro(df, "v", "g").collect()}
    assert got["a"]["n_vecs"] == 2
    assert got["a"]["sum_micro"] == [4_000_000, 6_000_000]
    assert got["a"]["mean"] == [2.0, 3.0]
    assert got["b"]["n_vecs"] == 1
    assert got["b"]["sum_micro"] == [500_000, -500_000]


def test_partition_invariance_bit_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        (F.col("vec_id") % 7).alias("g"), "embedding"
    )
    a = sorted(
        map(
            tuple,
            mean_pool_micro(emb.repartition(1), "embedding", "g")
            .select("g", "n_vecs", "sum_micro", "mean")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            mean_pool_micro(emb.repartition(17), "embedding", "g")
            .select("g", "n_vecs", "sum_micro", "mean")
            .collect(),
        )
    )
    # including the double means: derived from identical integers by
    # one division each, so bit-exact too
    assert a == b


def test_duckdb_twin_on_embeddings(spark):
    import duckdb

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        (F.col("vec_id") % 5).alias("g", ), "embedding"
    )
    got = sorted(
        (r["g"], r["n_vecs"], tuple(r["sum_micro"]))
        for r in mean_pool_micro(emb, "embedding", "g").collect()
    )
    con = duckdb.connect()
    want = sorted(
        (g, n, tuple(s))
        for g, n, s in con.execute(f"""
      WITH e AS (
        SELECT vec_id % 5 AS g, embedding
        FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
      ),
      x AS (
        SELECT g, i - 1 AS idx,
               CAST(ROUND(embedding[CAST(i AS INT)]::DOUBLE * 1000000)
                    AS BIGINT) AS micro
        FROM e, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      ),
      s AS (
        SELECT g, idx, SUM(micro) AS s, COUNT(*) AS n
        FROM x GROUP BY g, idx
      )
      SELECT g, MAX(n) AS n_vecs,
             list_transform(
               list_sort(list(struct_pack(idx := idx, s := s))),
               p -> p.s) AS sum_micro
      FROM s GROUP BY g
    """).fetchall()
    )
    con.close()
    assert got == want


def test_bad_scale_rejected(spark):
    df = spark.createDataFrame([("a", [1.0])], "g string, v array<double>")
    with pytest.raises(ValueError):
        mean_pool_micro(df, "v", "g", scale=0)


def test_ragged_groups_flagged_and_per_component_exact(spark):
    from sports_stats_data_pipeline_spark.operators.pooling import (
        mean_pool_micro,
    )

    df = spark.createDataFrame(
        [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 4.0, 5.0]),  # extra component
            ("b", [1.0, None]),      # NULL component
            ("b", [3.0, 4.0]),
        ],
        "g string, v array<double>",
    )
    got = {r["g"]: r for r in mean_pool_micro(df, "v", "g").collect()}
    a = got["a"]
    assert a["ragged"] == 1 and a["n_vecs"] == 2
    # idx 0,1 average over 2 vectors; idx 2 over the 1 that has it
    assert a["mean"] == [2.0, 3.0, 5.0]
    b = got["b"]
    assert b["ragged"] == 1
    assert b["mean"] == [2.0, 4.0]  # NULL component excluded, not zeroed
