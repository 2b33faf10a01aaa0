"""operators.components — hash-min connected components.

The driver-facing query (neardup_doc_clusters) only exercises shallow
dup-cluster graphs; these tests pin the properties the query relies on:
multi-round chain convergence, singleton handling, duplicate-edge
tolerance, and the max_rounds guard.
"""

from __future__ import annotations

import pytest

from sports_stats_data_pipeline_spark.operators.components import (
    connected_components,
)


def _cc(spark, nodes, edges, **kw):
    n = spark.createDataFrame([(x,) for x in nodes], "id long")
    e = spark.createDataFrame(
        edges or [(None, None)], "src long, dst long"
    ).filter("src is not null")
    out = connected_components(n, e, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_chain_needs_multiple_rounds(spark):
    # path graph 1-2-3-4-5-6: diameter 5, min label must walk the chain
    got = _cc(spark, range(1, 7), [(i, i + 1) for i in range(1, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_singletons_and_two_components(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(2, 1), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_duplicate_and_self_edges_are_harmless(spark):
    got = _cc(spark, [1, 2], [(1, 2), (1, 2), (2, 1), (1, 1)])
    assert got == {1: 1, 2: 1}


def test_max_rounds_guard(spark):
    with pytest.raises(RuntimeError, match="fixpoint"):
        _cc(
            spark,
            range(1, 7),
            [(i, i + 1) for i in range(1, 6)],
            max_rounds=2,
        )
