"""operators.nndescent: k-NN-graph recall vs brute force, monotone
descent, bit-determinism, and beam-search recall — the graph-ANN leg."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.nndescent import (
    graph_search,
    knn_graph_nndescent,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    return ids, Vn


def _true_knn(emb_np, k):
    ids, Vn = emb_np
    S = Vn @ Vn.T
    truth = {}
    for i, vid in enumerate(ids):
        s = S[i].copy()
        order = np.lexsort((ids, -s))
        truth[int(vid)] = set(
            int(ids[j]) for j in order if ids[j] != vid
        ) and set([int(ids[j]) for j in order if ids[j] != vid][:k])
    return truth


def _graph_recall(graph_rows, truth, k):
    got = {}
    for r in graph_rows:
        got.setdefault(r["src"], set()).add(r["dst"])
    return sum(
        len(got.get(q, set()) & t) / k for q, t in truth.items()
    ) / len(truth)


def test_descent_improves_and_hits_recall_floor(spark, emb_np):
    """Uniform 64-dim corpus — the HARD case for graph ANN (no cluster
    structure to exploit): the LSH-warmed init is still near-random,
    and six rounds with k_build=2k must converge to a near-exact graph
    (measured 0.997; floor pinned with margin)."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    truth = _true_knn(emb_np, K)
    r0 = _graph_recall(
        knn_graph_nndescent(emb, k=K, rounds=0).collect(), truth, K
    )
    r3 = _graph_recall(
        knn_graph_nndescent(emb, k=K, rounds=3).collect(), truth, K
    )
    assert r0 < 0.5, r0
    assert r3 > r0 + 0.1, (r0, r3)
    g = knn_graph_nndescent(emb, k=2 * K, rounds=6).collect()
    got = {}
    for r in g:
        if r["rank"] <= K:
            got.setdefault(r["src"], set()).add(r["dst"])
    r6 = sum(len(got.get(q, set()) & t) / K for q, t in truth.items()) / len(
        truth
    )
    assert r6 >= 0.95, r6


def test_clustered_data_converges_fast(spark):
    """Clustered data (the realistic embedding shape): 20 tight
    clusters x 20 members — four rounds at k_build=k reach ~0.99
    (floor 0.95). Also the regression pin for the exploration-edge
    escape hatch: pure neighbor-of-neighbor descent plateaued at 0.85
    here with whole nodes locked into the WRONG cluster."""
    import math

    rows = []
    for c in range(20):
        center = [math.cos(0.7 * c * (d + 1)) for d in range(32)]
        for m in range(20):
            rows.append(
                (
                    c * 20 + m,
                    [
                        center[d]
                        + 0.05 * math.sin(1.3 * (c * 20 + m) * (d + 1))
                        for d in range(32)
                    ],
                )
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    truth = {}
    for i, vid in enumerate(ids):
        order = np.lexsort((ids, -S[i]))
        truth[int(vid)] = set(
            [int(ids[j]) for j in order if ids[j] != vid][:K]
        )
    rec = _graph_recall(
        knn_graph_nndescent(emb, k=K, rounds=4).collect(), truth, K
    )
    assert rec >= 0.95, rec


def test_build_is_bit_deterministic(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    a = sorted(
        (r["src"], r["dst"], r["rank"], round(r["sim"], 12))
        for r in knn_graph_nndescent(emb, k=6, rounds=2).collect()
    )
    b = sorted(
        (r["src"], r["dst"], r["rank"], round(r["sim"], 12))
        for r in knn_graph_nndescent(emb, k=6, rounds=2).collect()
    )
    assert a == b and len(a) > 0


def test_graph_search_recall(spark, emb_np):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    graph = knn_graph_nndescent(emb, k=K, rounds=3)
    queries = spark.createDataFrame(
        [(i,) for i in range(0, 40)], "vec_id long"
    )
    truth = {
        q: t for q, t in _true_knn(emb_np, 3).items() if q < 40
    }
    got = {}
    for r in graph_search(
        graph, emb, queries, k=3, beam=16, hops=4
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(
        len(got.get(q, set()) & t) / 3 for q, t in truth.items()
    ) / len(truth)
    assert recall >= 0.8, recall
    # contract: no self-matches, exactly <= k rows per query
    for q, s in got.items():
        assert q not in s and len(s) <= 3


def test_validation_errors(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError):
        knn_graph_nndescent(emb, k=0)
    with pytest.raises(ValueError):
        knn_graph_nndescent(emb, k=5, rounds=-1)


def test_persisted_index_serves_identical_results(spark, tmp_path):
    """build_knn_graph_index -> graph_search_indexed must return the
    SAME rows as the direct build+search (the IVF indexed==direct
    contract), with zero descent work at query time."""
    from sports_stats_data_pipeline_spark.operators.nndescent import (
        build_knn_graph_index,
        graph_search,
        graph_search_indexed,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "gidx")
    build_knn_graph_index(emb, path, k=8, rounds=2)
    direct_graph = knn_graph_nndescent(emb, k=8, rounds=2)
    queries = spark.createDataFrame([(i,) for i in range(10)], "vec_id long")
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["score_r4"])
        for r in graph_search(
            direct_graph, emb, queries, k=3, beam=12, hops=3
        ).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["score_r4"])
        for r in graph_search_indexed(
            spark, path, F.col("vec_id") < 10, k=3, beam=12, hops=3
        ).collect()
    )
    assert got == want and len(got) == 30


def test_duckdb_cte_twin_is_bit_exact(spark):
    """knn_graph_cte_parts / graph_search_cte_parts (round 7): the
    unrolled DuckDB chain must reproduce the Spark build AND the beam
    search row-for-row — the value oracle behind the driver's 'graph'
    family in ann_ivf_label_topk. Params here deliberately differ from
    the driver slot's (k=5, rounds=1, hops=3) so the generators are
    pinned beyond the one registered configuration."""
    import duckdb

    from sports_stats_data_pipeline_spark.operators.nndescent import (
        graph_search_cte_parts,
        knn_graph_cte_parts,
        release_knn_graph,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    g = knn_graph_nndescent(emb, k=5, rounds=1)
    spark_graph = sorted(
        (r["src"], r["dst"], r["sim"], r["rank"]) for r in g.collect()
    )
    corpus = (
        "SELECT vec_id AS id, embedding::DOUBLE[] AS v "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    )
    parts, final = knn_graph_cte_parts(corpus, k=5, rounds=1)
    duck_graph = sorted(
        duckdb.sql(
            "WITH "
            + ",\n".join(parts)
            + f"\nSELECT src, dst, sim, rank FROM {final}"
        ).fetchall()
    )
    assert len(spark_graph) > 0 and spark_graph == duck_graph

    queries = spark.createDataFrame([(i,) for i in range(6)], "vec_id long")
    spark_out = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], r["score_r4"])
        for r in graph_search(g, emb, queries, k=3, beam=10, hops=3).collect()
    )
    q_parts, q_out = graph_search_cte_parts(
        final,
        "gvec",
        "SELECT vec_id AS qid FROM read_parquet("
        f"'{SF}/embeddings.parquet') WHERE vec_id < 6",
        k=3,
        beam=10,
        hops=3,
    )
    duck_out = sorted(
        duckdb.sql(
            "WITH "
            + ",\n".join(parts + q_parts)
            + f"\nSELECT query_id, neighbor_id, rank, score_r4 FROM {q_out}"
        ).fetchall()
    )
    assert len(spark_out) == 18 and spark_out == duck_out
    release_knn_graph(g)


def test_incremental_new_flag_is_exact(spark):
    """incremental=True (round 7): the classic NN-Descent "new"-flag
    candidate cut must be bit-identical to the full expansion — a
    both-old 2-hop path was expanded the round both its edges appeared,
    and per-src top-k lists improve monotonically, so skipped pairs can
    never re-enter. Pinned across multiple rounds (the bookkeeping
    carries state round-to-round) on the uniform corpus, the hard case
    where the graph keeps churning."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    for k, rounds in ((6, 3), (4, 1)):
        full = sorted(
            (r["src"], r["dst"], r["rank"], r["sim"])
            for r in knn_graph_nndescent(emb, k=k, rounds=rounds).collect()
        )
        inc = sorted(
            (r["src"], r["dst"], r["rank"], r["sim"])
            for r in knn_graph_nndescent(
                emb, k=k, rounds=rounds, incremental=True
            ).collect()
        )
        assert len(full) > 0 and full == inc, (k, rounds)


def test_cte_parts_validation():
    from sports_stats_data_pipeline_spark.operators.nndescent import (
        knn_graph_cte_parts,
    )

    with pytest.raises(ValueError):
        knn_graph_cte_parts("SELECT 1", k=0)


def test_release_rejects_derived_frames(spark):
    """ADVICE r6: the release handle rides a dynamic attribute that
    DataFrame transformations drop — releasing a derived frame must be
    a loud error (silent leak otherwise), and the original releases
    fine."""
    from sports_stats_data_pipeline_spark.operators.nndescent import (
        knn_graph_nndescent,
        release_knn_graph,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    g = knn_graph_nndescent(emb, k=3, rounds=0)
    derived = g.select("src", "dst")
    with pytest.raises(ValueError, match="not a releasable graph"):
        release_knn_graph(derived)
    release_knn_graph(g)  # the original frame carries the handle
