"""operators.quantize — int8 code determinism vs a DuckDB twin, the
reconstruction error bound, and recall of quantized vs exact cosine
top-k on the real embeddings."""

from __future__ import annotations

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.functions.vectors import as_double, cosine
from sports_stats_data_pipeline_spark.operators.quantize import (
    dequantize,
    quantize_embeddings,
    quantized_cosine_topk,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _quantized(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    return quantize_embeddings(emb)


def test_codes_match_duckdb_twin(spark):
    got = {
        r["vec_id"]: (r["qscale"], r["qvec"])
        for r in _quantized(spark).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            s AS (
              SELECT vec_id, e,
                     CASE WHEN list_max(list_transform(e, x -> abs(x))) > 0
                          THEN list_max(list_transform(e, x -> abs(x))) / 127.0
                          ELSE 1.0 END AS qscale
              FROM v
            )
            SELECT vec_id, qscale,
                   list_transform(e, x -> CAST(floor(x / qscale + 0.5) AS INTEGER))
            FROM s
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for vid in got:
        assert got[vid][0] == want[vid][0], vid  # bit-exact scale
        assert list(got[vid][1]) == list(want[vid][1]), vid


def test_roundtrip_error_bound_and_code_range(spark):
    q = _quantized(spark)
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    joined = q.join(emb, "vec_id").select(
        "vec_id",
        F.array_max(
            F.zip_with(
                as_double(F.col("embedding")),
                dequantize(F.col("qvec"), F.col("qscale")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
        (F.col("qscale") / 2.0).alias("bound"),
        F.array_max(F.transform("qvec", lambda c: F.abs(c))).alias("cmax"),
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0
    assert joined.filter(F.col("cmax") > 127).count() == 0


def test_zero_vector_is_all_zero_codes(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = quantize_embeddings(df).first()
    assert row["qscale"] == 1.0 and list(row["qvec"]) == [0, 0, 0]


def test_quantized_topk_recall_vs_exact(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 8)
    k = 10
    # exact float cosine top-k, same topology
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qe"),
    )
    exact = (
        emb.select("vec_id", as_double(F.col("embedding")).alias("e"))
        .join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("e")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    exact_top = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
        .collect()
    )
    qall = _quantized(spark)
    approx_top = quantized_cosine_topk(
        qall, qall.filter(F.col("vec_id") < 8), k=k
    ).select("query_id", "neighbor_id").collect()

    def sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    es, qs = sets(exact_top), sets(approx_top)
    assert set(es) == set(qs) and all(len(v) == k for v in qs.values())
    recall = sum(len(es[q_] & qs[q_]) for q_ in es) / (k * len(es))
    # int8 on 64-dim vectors loses little — require high recall
    assert recall >= 0.85, recall


def test_quantized_ivf_probe_all_equals_quantized_bruteforce(spark):
    from sports_stats_data_pipeline_spark.operators.quantize import (
        quantized_ivf_topk,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    qall = _quantized(spark)
    brute = quantized_cosine_topk(
        qall, qall.filter(F.col("vec_id") < 8), k=5
    ).collect()
    ivf_all = quantized_ivf_topk(
        emb, F.col("vec_id") < 8, k=5, n_cells=4, n_probe=4
    ).collect()

    def as_set(rows):
        return {
            (r["query_id"], r["neighbor_id"], r["qcos_micro"]) for r in rows
        }

    assert as_set(brute) == as_set(ivf_all)


def test_quantized_ivf_partial_probe_recall(spark):
    from sports_stats_data_pipeline_spark.operators.quantize import (
        quantized_ivf_topk,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    qall = _quantized(spark)
    k = 5
    brute = quantized_cosine_topk(
        qall, qall.filter(F.col("vec_id") < 8), k=k
    ).collect()
    ivf = quantized_ivf_topk(
        emb, F.col("vec_id") < 8, k=k, n_cells=8, n_probe=4
    ).collect()

    def sets(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    bs, vs = sets(brute), sets(ivf)
    recall = sum(len(bs[q_] & vs.get(q_, set())) for q_ in bs) / (
        k * len(bs)
    )
    # half the cells probed -> most true neighbors still found (label-
    # clustered corpus; the dial trades the rest for 2x less work)
    assert recall >= 0.5, recall
