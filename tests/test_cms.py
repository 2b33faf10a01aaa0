"""Count-Min sketch: overestimate-only bound, exactness without
collisions, bit-exact mergeability (the incremental contract), and a
DuckDB twin of the build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _counts_df(spark, rows):
    return spark.createDataFrame(rows, "k string, v string")


def test_estimates_exact_without_collisions(spark):
    rows = [("a", f"val{i}") for i in range(10) for _ in range(i + 1)]
    df = _counts_df(spark, rows)
    sk = cms_build(df, ["k"], "v", width=512, depth=4)
    est = sk.select(
        *[
            cms_estimate(
                F.col("cms"), F.lit(f"val{i}"), width=512, depth=4
            ).alias(f"e{i}")
            for i in range(10)
        ]
    ).collect()[0]
    assert [est[f"e{i}"] for i in range(10)] == [i + 1 for i in range(10)]


def test_never_undercounts_at_tiny_width(spark):
    rows = [("a", f"v{i % 17}") for i in range(200)]
    true = {}
    for _, v in rows:
        true[v] = true.get(v, 0) + 1
    df = _counts_df(spark, rows)
    sk = cms_build(df, ["k"], "v", width=8, depth=3)
    for v, n in true.items():
        got = sk.select(
            cms_estimate(F.col("cms"), F.lit(v), width=8, depth=3)
        ).collect()[0][0]
        assert got >= n  # one-sided error, always


def test_merge_equals_whole_bit_exact(spark):
    rows = [
        (f"k{i % 3}", f"v{(i * 7) % 11}") for i in range(120)
    ]
    df = _counts_df(spark, rows)
    whole = {
        r["k"]: r["cms"]
        for r in cms_build(df, ["k"], "v", width=64, depth=4).collect()
    }
    h1 = cms_build(
        df.filter(F.crc32(F.col("v")) % 2 == 0), ["k"], "v",
        width=64, depth=4,
    )
    h2 = cms_build(
        df.filter(F.crc32(F.col("v")) % 2 == 1), ["k"], "v",
        width=64, depth=4,
    )
    merged = (
        h1.withColumnRenamed("cms", "c1")
        .join(h2.withColumnRenamed("cms", "c2"), "k", "full")
        .select(
            "k",
            cms_merge(
                F.coalesce(
                    F.col("c1"),
                    F.array_repeat(F.lit(0).cast("long"), 256),
                ),
                F.coalesce(
                    F.col("c2"),
                    F.array_repeat(F.lit(0).cast("long"), 256),
                ),
            ).alias("cms"),
        )
    )
    got = {r["k"]: r["cms"] for r in merged.collect()}
    assert got == whole


def test_duckdb_twin_of_build(spark):
    import duckdb

    from sports_stats_data_pipeline_spark.functions.text import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PRIME,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        F.lit("all").alias("k"), F.col("source").alias("v")
    )
    W, D = 32, 3
    got = cms_build(docs, ["k"], "v", width=W, depth=D).collect()[0]["cms"]
    cells = " , ".join(
        f"({r} * {W} + (({MINHASH_A[r]} * base + {MINHASH_B[r]}) "
        f"% {MINHASH_PRIME}) % {W})"
        for r in range(D)
    )
    con = duckdb.connect()
    want = con.execute(f"""
      WITH b AS (
        SELECT ('0x' || substr(md5(source), 1, 8))::BIGINT AS base
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        WHERE source IS NOT NULL
      ),
      hits AS (
        SELECT unnest([{cells}]) AS cell FROM b
      ),
      agg AS (SELECT cell, COUNT(*) AS cnt FROM hits GROUP BY cell)
      SELECT list(COALESCE(agg.cnt, 0) ORDER BY r.i)
      FROM range(0, {W * D}) r(i) LEFT JOIN agg ON agg.cell = r.i
    """).fetchone()[0]
    con.close()
    assert list(got) == [int(x) for x in want]


def test_bad_args(spark):
    df = _counts_df(spark, [("a", "x")])
    with pytest.raises(ValueError):
        cms_build(df, ["k"], "v", width=1)
    with pytest.raises(ValueError):
        cms_build(df, ["k"], "v", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, ["k"], "v", depth=99)
