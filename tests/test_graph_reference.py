"""Pins for plans.graph_reference.union_find_labels — the Python
connected-components referee that replaces the recursive-walk CTE in
the sampled-scale (>=30x) doc-clusters oracle (the walk's
O(component^2) working set spilled ~75 GB and killed the 100x
referee; SCALING.md round 9).

Trust chain: the union-find is pinned BIT-EXACT against the very SQL
it replaces (the walk/lab CTE pair, run in DuckDB) on randomized graph
shapes — cliques, chains that merge cliques into one big component
(the shape that kills the walk at scale, kept small here), singletons,
both edge orientations — and on the real corpus pair table at
sf0.001. test_scale_oracle_modes then pins the full labels-mode oracle
against the registered full oracle."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from sports_stats_data_pipeline_spark.plans.graph_reference import (
    union_find_labels,
)

WALK_SQL = """
WITH RECURSIVE docs AS (SELECT doc_id FROM ids),
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
walk(id, lbl) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT s.v, w.lbl FROM walk w JOIN sym s ON s.u = w.id
  WHERE w.lbl < s.v
),
lab AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY id)
SELECT doc_id, cluster_id FROM lab ORDER BY doc_id
"""


def _walk_labels(nodes: list[int], edges: list[tuple[int, int]]):
    con = duckdb.connect()
    try:
        con.register("ids", pd.DataFrame({"doc_id": nodes}))
        con.register(
            "pairs",
            pd.DataFrame(edges, columns=["doc_a", "doc_b"])
            if edges
            else pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                               "doc_b": pd.Series([], dtype="int64")}),
        )
        return [tuple(r) for r in con.execute(WALK_SQL).fetchall()]
    finally:
        con.close()


def _uf_labels(nodes, edges):
    return sorted(union_find_labels(nodes, edges))


def test_singletons_and_empty_edges():
    nodes = [5, 9, 1]
    assert _uf_labels(nodes, []) == [(1, 1), (5, 5), (9, 9)]
    assert _uf_labels(nodes, []) == _walk_labels(nodes, [])


def test_clique_chain_merges_to_one_component():
    # three 4-cliques bridged into ONE component — the exact shape
    # whose label propagation blows up the walk at scale
    nodes, edges = [], []
    for k in range(3):
        ids = [100 * k + i for i in range(4)]
        nodes += ids
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(3, 100), (103, 200)]  # bridges
    got = _uf_labels(nodes, edges)
    assert got == _walk_labels(nodes, edges)
    assert {lbl for _, lbl in got} == {0}


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_randomized_graphs_match_walk_sql(seed):
    rng = random.Random(seed)
    n = rng.randint(5, 120)
    nodes = rng.sample(range(1, 10_000), n)
    m = rng.randint(0, 3 * n)
    edges = []
    for _ in range(m):
        a, b = rng.sample(nodes, 2)
        # store in either orientation — connectivity must not care
        edges.append((a, b) if rng.random() < 0.5 else (b, a))
    assert _uf_labels(nodes, edges) == _walk_labels(nodes, edges)


def test_unseeded_endpoint_rejected_and_sql_quirk_documented():
    """An edge endpoint outside node_ids is REFUSED: the walk CTE is
    only a correct components algorithm when every endpoint is seeded
    — on an unseeded id smaller than its neighbors' labels the SQL
    silently fails to connect the component (shown below), an input
    the real oracle can never produce (pairs derive from docs)."""
    with pytest.raises(ValueError, match="outside node_ids"):
        union_find_labels([1, 2], [(1, 99), (99, 2)])
    # the quirk the precondition guards against, pinned on the SQL:
    # 5-3-7 via unseeded 3 does NOT merge 5 and 7 in the walk
    assert _walk_labels([5, 7], [(5, 3), (3, 7)]) == [(5, 5), (7, 7)]


def test_real_corpus_pairs_sf0001(spark):
    """The real relation under test: the engine's verified pair table
    and doc ids at sf0.001 — union-find labels == walk labels."""
    from sports_stats_data_pipeline_spark.plans.documents import (
        _minhash_verified_pairs,
        _neardup_docs,
    )

    docs = _neardup_docs(spark, "/root/testdata/sf0.001")
    pairs = _minhash_verified_pairs(docs).toPandas()
    ids = docs.select("doc_id").toPandas()["doc_id"].tolist()
    edges = list(zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist()))
    assert len(edges) > 0
    assert _uf_labels(ids, edges) == _walk_labels(ids, edges)


def test_hypothesis_union_find_matches_bfs():
    """Property: union-find labels equal an independent BFS components
    reference (no DuckDB in the loop — a third implementation) on
    random graphs, so the UF is triangulated by BOTH the walk SQL
    (above) and a from-scratch traversal."""
    from collections import deque

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def graphs(draw):
        n = draw(st.integers(min_value=1, max_value=60))
        nodes = draw(
            st.lists(
                st.integers(min_value=0, max_value=10_000),
                min_size=n, max_size=n, unique=True,
            )
        )
        m = draw(st.integers(min_value=0, max_value=3 * n))
        idx = st.integers(min_value=0, max_value=n - 1)
        raw = draw(st.lists(st.tuples(idx, idx), min_size=m, max_size=m))
        edges = [(nodes[i], nodes[j]) for i, j in raw]
        return nodes, edges

    def bfs_labels(nodes, edges):
        adj = {v: [] for v in nodes}
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        lab, seen = {}, set()
        for start in sorted(nodes):
            if start in seen:
                continue
            comp, dq = [], deque([start])
            seen.add(start)
            while dq:
                v = dq.popleft()
                comp.append(v)
                for w in adj[v]:
                    if w not in seen:
                        seen.add(w)
                        dq.append(w)
            mn = min(comp)
            for v in comp:
                lab[v] = mn
        return sorted(lab.items())

    @settings(max_examples=200, deadline=None)
    @given(graphs())
    def prop(g):
        nodes, edges = g
        assert sorted(union_find_labels(nodes, edges)) == bfs_labels(
            nodes, edges
        )

    prop()
