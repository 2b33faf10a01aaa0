"""Fast-path ANN kernel vs oracle-checked expression twin, and the
compaction maintenance operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.maintenance import (
    compact_parquet,
    parquet_file_count,
)
from sports_stats_data_pipeline_spark.operators.similarity import (
    ann_topk_numpy,
)
from sports_stats_data_pipeline_spark.plans.documents import (
    embedding_cosine_topk,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_numpy_ann_matches_expression_baseline(spark):
    emb = load_table(spark, SF, "embeddings")
    fast = ann_topk_numpy(emb, F.col("vec_id") < 8, k=3)
    slow = embedding_cosine_topk(spark, SF)
    f = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in fast.collect()}
    s = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in slow.collect()}
    assert f == s


def test_numpy_ann_score_ties_keep_smaller_ids(spark):
    # duplicate vectors -> exact score ties spanning the k boundary; the
    # batch-local truncation must keep the smaller neighbor ids, matching
    # the final (score desc, neighbor_id asc) rule regardless of
    # partitioning (single-partition vs many changes batch composition).
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, base)] + [(i, base) for i in range(1, 7)] + [
        (7, [0.0, 1.0, 0.0, 0.0])
    ]
    for parts in (1, 4):
        emb = spark.createDataFrame(
            rows, schema="vec_id long, embedding array<double>"
        ).repartition(parts)
        out = sorted(
            (r["rank"], r["neighbor_id"])
            for r in ann_topk_numpy(emb, F.col("vec_id") == 0, k=3).collect()
        )
        assert out == [(1, 1), (2, 2), (3, 3)], (parts, out)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    orders = load_table(spark, SF, "orders")
    orders.repartition(37).write.mode("overwrite").parquet(path)
    n_before = parquet_file_count(path)
    assert n_before >= 37

    before_rows = sorted(
        map(tuple, spark.read.parquet(path).select("o_orderkey").collect())
    )
    out = compact_parquet(spark, path, target_partitions=4)
    assert parquet_file_count(path) <= 4
    after_rows = sorted(map(tuple, out.select("o_orderkey").collect()))
    assert before_rows == after_rows
