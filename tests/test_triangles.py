"""Triangle counting: hand-anchored graphs, a brute-force python
reference on a derived corpus graph, and input-robustness (direction,
duplicates, self-loops must not matter)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.triangles import (
    triangle_counts,
    triangles,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _ref_triangles(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = set()
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            out.add((x, y, z))
    return out


def test_k4_has_four_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {tuple(r) for r in triangles(_df(spark, k4)).collect()}
    assert got == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    counts = dict(
        (r["node"], r["n_triangles"])
        for r in triangle_counts(_df(spark, k4)).collect()
    )
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}  # each node in C(3,2)=3


def test_triangle_free_graphs(spark):
    path = [(i, i + 1) for i in range(6)]
    star = [(0, i) for i in range(1, 8)]
    for g in (path, star):
        assert triangles(_df(spark, g)).count() == 0
        cts = triangle_counts(_df(spark, g)).collect()
        assert all(r["n_triangles"] == 0 for r in cts)
        # every node present even at zero
        assert len(cts) == len({n for e in g for n in e})


def test_direction_duplicates_selfloops_ignored(spark):
    base = [(0, 1), (1, 2), (0, 2)]
    messy = base + [(1, 0), (2, 1), (0, 1), (3, 3), (2, 0)]
    a = sorted(map(tuple, triangles(_df(spark, base)).collect()))
    b = sorted(map(tuple, triangles(_df(spark, messy)).collect()))
    assert a == b == [(0, 1, 2)]


def test_matches_python_reference_on_corpus_graph(spark):
    # derived deterministic graph over doc ids: dense enough for
    # triangles, including a high-degree hub to exercise orientation
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    edges = (
        docs.select(
            (F.col("doc_id") % 30).alias("src"),
            ((F.col("doc_id") * 3 + 1) % 30).alias("dst"),
        )
        .union(docs.select((F.col("doc_id") % 30), F.lit(0)))
    )
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    want = _ref_triangles(rows)
    got = {tuple(r) for r in triangles(edges).collect()}
    assert got == want
    # per-node counts agree with the triangle list
    per = dict(
        (r["node"], r["n_triangles"]) for r in triangle_counts(edges).collect()
    )
    from collections import Counter

    want_counts = Counter(n for t in want for n in t)
    nodes = {n for e in rows for n in e if e[0] != e[1]}
    assert per == {n: want_counts.get(n, 0) for n in nodes}
