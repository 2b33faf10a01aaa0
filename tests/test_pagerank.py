"""PageRank: fixed-point determinism (cross-engine + cross-partitioning
exact), a hand-mirrored Python reference, and float-mode sanity."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.pagerank import (
    SCALE,
    pagerank,
    pagerank_fixedpoint,
    pagerank_fixedpoint_sql,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _ref_fixed(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Plain-Python mirror of the fixed-point semantics: every division
    floors, every sum is exact — the number both engines must hit."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = Counter(u for u, _ in edges)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(k):
        dang = sum(rank[v] for v in nodes if out[v] == 0)
        base = (SCALE * 15) // (100 * n)
        ds = (dang * 85) // (100 * n)
        ins: dict[int, int] = defaultdict(int)
        for u, v in edges:
            ins[v] += (rank[u] * 85) // (100 * out[u])
        rank = {v: base + ds + ins[v] for v in nodes}
    return rank


EDGES = [
    (1, 2),
    (2, 3),
    (3, 1),
    (1, 3),
    (4, 1),  # 4 has out-degree 1, in-degree 0
    (5, 5),  # self-loop
    (2, 6),  # 6 is dangling (no out-edges)
]


def test_fixedpoint_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixedpoint(df, iterations=4).collect()
    }
    assert got == _ref_fixed(EDGES, 4)


def test_fixedpoint_partition_invariant(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
    a = sorted(map(tuple, pagerank_fixedpoint(df1, iterations=3).collect()))
    b = sorted(map(tuple, pagerank_fixedpoint(df7, iterations=3).collect()))
    assert a == b


def test_fixedpoint_matches_duckdb_twin(spark):
    """Same derived graph built in both engines from the same parquet;
    ranks must be bit-identical."""
    import duckdb

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    edges = docs.select(
        (F.col("doc_id") % 40).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 40).alias("dst"),
    ).union(
        # a node that appears only as a destination -> dangling mass path
        spark.createDataFrame([(1, 997)], "src long, dst long")
    )
    got = sorted(
        map(tuple, pagerank_fixedpoint(edges, iterations=5).collect())
    )

    cte = (
        "SELECT doc_id % 40 AS src, (doc_id * 7 + 3) % 40 AS dst "
        f"FROM read_parquet('{SF_SMOKE}/documents.parquet') "
        "UNION ALL SELECT 1, 997"
    )
    con = duckdb.connect()
    oracle = sorted(
        map(tuple, con.execute(pagerank_fixedpoint_sql(cte, 5)).fetchall())
    )
    con.close()
    assert got == oracle


def test_mass_conservation_and_float_ordering(spark):
    # star graph: every spoke points at the hub -> hub outranks spokes.
    # The 0<->1 cycle oscillates with period 2 and decay 0.85/round, so
    # the ordering only settles once 0.85^k is well under the ~0.05
    # stationary hub-vs-1 gap — 30 rounds, not 10.
    star = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(star, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iterations=30).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 3 * ranks[2]
    # float mode conserves mass up to rounding; fixed mode only leaks
    # downward (floor) and by less than a few edges' worth of ulps
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    fp = {
        r["node"]: r["rank"]
        for r in pagerank_fixedpoint(df, iterations=30).collect()
    }
    assert 0 <= SCALE - sum(fp.values()) < 100 * len(star) * 30
    assert fp[0] == max(fp.values())


def test_bad_iterations_rejected(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank_fixedpoint_sql("SELECT 1 AS src, 2 AS dst", 0)


def test_warm_start_resumes_bit_exact(spark):
    """k1+k2 rounds in one run == k2 rounds warm-started from k1
    rounds' output — the restartability contract for long jobs."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    full = sorted(map(tuple, pagerank_fixedpoint(df, iterations=5).collect()))
    first = pagerank_fixedpoint(df, iterations=2)
    resumed = sorted(
        map(
            tuple,
            pagerank_fixedpoint(df, iterations=3, init_ranks=first).collect(),
        )
    )
    assert resumed == full


def test_checkpoint_blocks_released_per_round(spark):
    """DataFrame.unpersist is a no-op on localCheckpoint state; the loop
    must use the explicit release handle (operators/iterutil.py) so a
    k-round run does NOT pin k rank relations."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(EDGES, "src long, dst long")
    pagerank_fixedpoint(df, iterations=6).collect()
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    # at most the FINAL round's checkpoint lingers (plus nothing from
    # the 5 freed rounds; the nodes/edges persists were unpersisted)
    assert len(after - before) <= 1, sorted(after - before)


def test_fixedpoint_driver_path_matches_distributed_loop(spark, monkeypatch):
    """Docstring claim of the small-graph fast path: the driver-side
    integer rounds are BIT-IDENTICAL to the distributed loop (exact
    BIGINT arithmetic on both sides), on a graph with parallel edges,
    a self-loop, dangling nodes, and a cycle."""
    import random

    from sports_stats_data_pipeline_spark.operators import components as C
    from sports_stats_data_pipeline_spark.operators.pagerank import (
        pagerank_fixedpoint,
    )

    rng = random.Random(99)
    edges = (
        [(1, 2), (1, 2), (2, 3), (3, 1), (4, 4), (5, 6)]  # 7 dangles
        + [(rng.randint(10, 30), rng.randint(10, 30)) for _ in range(40)]
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    monkeypatch.setattr(C, "SMALL_GRAPH_EDGES", 10_000)
    fast = sorted(map(tuple, pagerank_fixedpoint(edf, iterations=4).collect()))
    monkeypatch.setattr(C, "SMALL_GRAPH_EDGES", 0)
    loop = sorted(map(tuple, pagerank_fixedpoint(edf, iterations=4).collect()))
    assert fast == loop and len(fast) > 0
