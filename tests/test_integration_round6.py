"""Round-6 integration: the new pieces composed the way a pipeline
actually uses them — incremental mart with the percentile leg →
single-pass validated publish → atomic multi-table snapshot (mart +
dimension together) → time travel → graph-ANN build/search over the
same corpus. Each seam here is a real production seam; the chain
catches interface drift the unit suites can't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.incremental import (
    aggregate_delta,
    merge_aggregate_state,
)
from sports_stats_data_pipeline_spark.operators.multisnapshot import (
    read_group_table,
    write_group_snapshot,
)
from sports_stats_data_pipeline_spark.operators.observe import (
    PublishGateError,
    write_validated,
)
from sports_stats_data_pipeline_spark.operators.quantiles import (
    qsketch_entry,
    qsketch_quantile,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_mart_publish_snapshot_timetravel_chain(spark, tmp_path):
    orders = (
        load_table(spark, SF, "orders")
        .withColumn(
            "price_c", F.round(F.col("o_totalprice") * 100).cast("long")
        )
        .withColumn("pq", qsketch_entry("o_orderkey", "price_c"))
    )
    measures = {
        "n_orders": ("count", "o_orderkey"),
        "volume_c": ("sum", "price_c"),
        "price_sample": ("quantile_sketch", "pq"),
    }
    cut = F.lit("1997-01-01").cast("timestamp")
    state = aggregate_delta(
        orders.filter(F.col("o_orderdate") < cut), ["o_custkey"], measures
    )
    mart = merge_aggregate_state(
        state,
        orders.filter(F.col("o_orderdate") >= cut),
        ["o_custkey"],
        measures,
    ).withColumn("p50_price_c", qsketch_quantile("price_sample", 1, 2))

    # 1. validated publish: metrics ride the mart write; a sane batch
    # promotes, and the metrics double as the publish audit record
    sink = str(tmp_path / "mart")
    metrics = write_validated(
        mart.drop("price_sample"),
        sink,
        {
            "n": F.count(F.lit(1)),
            "null_keys": F.sum(F.col("o_custkey").isNull().cast("long")),
            "min_p50": F.min("p50_price_c"),
        },
        {
            "nonempty": lambda m: m["n"] > 0,
            "keyed": lambda m: m["null_keys"] == 0,
            "positive_prices": lambda m: m["min_p50"] > 0,
        },
    )
    assert metrics["n"] == mart.count()

    # 2. atomic multi-table snapshot: mart + customer dim as ONE commit
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    root = str(tmp_path / "grp")
    v1 = write_group_snapshot(
        {"mart": spark.read.parquet(sink), "dim": cust}, root
    )
    # an "updated" mart version; dim carried forward untouched
    v2 = write_group_snapshot(
        {
            "mart": spark.read.parquet(sink).withColumn(
                "n_orders", F.col("n_orders") + 1
            )
        },
        root,
        mode="append",
    )
    assert (v1, v2) == (1, 2)
    # 3. time travel: version-1 join is consistent and reproducible
    m1 = read_group_table(spark, root, "mart", 1)
    d1 = read_group_table(spark, root, "dim", 1)
    joined = m1.join(d1, m1.o_custkey == d1.c_custkey)
    assert joined.count() == m1.count()
    # exact percentile correctness at v1, spot-checked vs raw orders
    some = m1.orderBy("o_custkey").limit(3).collect()
    for r in some:
        vals = sorted(
            x["price_c"]
            for x in orders.filter(
                F.col("o_custkey") == r["o_custkey"]
            ).collect()
        )
        assert r["p50_price_c"] == vals[(len(vals) - 1) // 2]

    # 4. a poisoned re-publish must not replace the validated mart
    with pytest.raises(PublishGateError):
        write_validated(
            mart.drop("price_sample").withColumn(
                "o_custkey", F.lit(None).cast("long")
            ),
            sink,
            {"null_keys": F.sum(F.col("o_custkey").isNull().cast("long"))},
            {"keyed": lambda m: m["null_keys"] == 0},
        )
    assert spark.read.parquet(sink).count() == metrics["n"]


def test_graph_ann_over_corpus_embeddings(spark, tmp_path):
    """Build the persisted graph index over the corpus embeddings and
    serve a query batch — recall sanity vs the IVF brute-force twin's
    exact top-1 (the two ANN families must agree on the easy cases)."""
    from sports_stats_data_pipeline_spark.operators.nndescent import (
        build_knn_graph_index,
        graph_search_indexed,
    )
    from sports_stats_data_pipeline_spark.operators.similarity import (
        ann_topk_numpy,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "gidx")
    build_knn_graph_index(emb, path, k=12, rounds=4)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in graph_search_indexed(
            spark, path, F.col("vec_id") < 12, k=3, beam=16, hops=4
        ).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk_numpy(emb, F.col("vec_id") < 12, k=3).collect()
    }
    top1_hits = sum(
        1 for q in range(12) if got.get((q, 1)) == exact.get((q, 1))
    )
    assert top1_hits >= 9  # >= 75% exact top-1 agreement on 64-dim uniform
