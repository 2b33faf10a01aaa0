"""Independent Python connected-components reference for the
doc-clusters referee at sampled scale (factor >=30 — wherever
SPARK_GRAFT_SCALE_SAMPLED gates the referee-relief modes).

The registered ``neardup_doc_clusters`` oracle labels components with a
recursive label-propagation CTE (``walk`` in
:func:`plans.documents.doc_clusters_oracle_sql`): every node
accumulates every smaller label reachable from it, so the working set
is O(component_size^2) rows and the recursion depth is the component
diameter. Fine at driver SF (components are single cliques); fatal on
replica corpora whose synthesized near-dups CHAIN cliques into large
components — measured: a 600k-node chained component did not terminate
in 9 minutes and the 100x run spilled ~75 GB of DuckDB temp before
dying on disk (SCALING.md round 9). The blow-up is the REFEREE's
algorithm, not the engine's (the engine runs hash-min small-star
rounds, O(E log n)).

This module is the relief: exact union-find over the engine's verified
pair table — pure integer work (cluster id = MIN doc_id of the
component, the same value MIN(lbl) converges to), O(E α(n)) time,
O(V) memory, no floats anywhere so bit-exactness is structural. The
scale tier computes labels here, registers them, and passes the
relation name as ``labels_source`` to ``doc_clusters_oracle_sql`` so
DuckDB still independently recomputes the OTHER graph legs (PageRank
rounds, triangles, SemDeDup) — the layered-referee pattern already
used for engine-pairs mode and the streaming Python fold. Pinned
bit-exact against the recursive-walk SQL in
tests/test_graph_reference.py.
"""

from __future__ import annotations

from typing import Iterable


def union_find_labels(
    node_ids: Iterable[int], edges: Iterable[tuple[int, int]]
) -> list[tuple[int, int]]:
    """(node, min-id-in-component) for every node in ``node_ids``.

    Nodes absent from ``edges`` label themselves (singleton clusters),
    matching the walk CTE's seed row ``SELECT doc_id, doc_id``.

    PRECONDITION (enforced): every edge endpoint must appear in
    ``node_ids``. The walk CTE only propagates a label to ids LARGER
    than it (``w.lbl < s.v``), which computes true connectivity
    exactly when every node is seeded; on an unseeded endpoint smaller
    than its neighbors' labels the SQL silently fails to connect the
    component (pinned in test_graph_reference.py). The real oracle can
    never present that input — its pairs derive FROM docs — so the
    reference refuses it rather than imitating a degenerate answer.

    Union-by-minimum keeps every root the smallest id of its component
    (the exact value ``MIN(lbl)`` converges to in the SQL); path
    compression in ``find`` keeps the forest near-flat, so 10M edges
    resolve in seconds on one core.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    seeded = {int(n) for n in node_ids}
    for a, b in edges:
        a, b = int(a), int(b)
        if a not in seeded or b not in seeded:
            raise ValueError(
                f"edge ({a}, {b}) has an endpoint outside node_ids: the "
                "walk CTE this reference replaces is only a correct "
                "components algorithm when every endpoint is seeded "
                "(its lbl<v propagation skips smaller unseeded ids)"
            )
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb

    return [(n, find(n)) for n in seeded]
