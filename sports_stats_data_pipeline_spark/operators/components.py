"""Connected components over an undirected edge list — the cluster-
resolution step of a dedup pipeline (pair generation emits near-dup
EDGES; the dedup decision needs per-document CLUSTERS: every member of a
connected component is the "same" document, one canonical survivor is
kept).

Algorithm: hash-min label propagation to fixpoint. Every node starts
labelled with its own id; each round a node adopts the minimum label
among itself and its neighbours; at the fixpoint every node carries the
component's global minimum id, which doubles as the deterministic
canonical/cluster id (min-id survivorship — the same first-wins policy
as operators.merge, cf. reference fighters_scraper.py:150-156 keeping
the first-seen row per key).

Scale shape: each round is one shuffle join (edges ⋈ labels on the node
id) plus one hash aggregate (min per node) — nothing driver-side, state
is one (node, label) row per node. Rounds needed = component diameter.
Dedup-cluster graphs are shallow (a near-dup cluster is a quasi-clique:
most members link directly to the canonical copy), so the fixpoint
arrives in 2-4 rounds in practice; for adversarial long-chain graphs the
alternating small-star/large-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) brings worst-case rounds to
O(log n) — same join+agg primitives, documented here as the scale-out
upgrade path. The convergence probe per round is a LIMIT 1 existence
check on changed labels, not a full count.

Determinism: min() is order-insensitive and the iteration runs to an
exact fixpoint, so the output is independent of partitioning, scheduling
and input order — both engines (and any two cluster runs) agree bit-for-
bit, which is what lets the driver hash-compare this against a recursive
-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``nodes``: one row per node (isolated nodes become singleton
    clusters). ``edges``: undirected pairs; duplicates are harmless
    (min is idempotent) so callers need not pay a distinct.

    Returns ``(id_col, cluster_id)``, one row per node. Raises if the
    fixpoint is not reached within ``max_rounds`` — a diameter that deep
    means the input is not a dedup-cluster graph and the small-star/
    large-star variant (module docstring) should be used instead.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lbl")
    ).persist()

    try:
        for _ in range(max_rounds):
            # candidate labels flowing across edges this round
            prop = sym.join(
                labels.withColumnRenamed("id", "u"), "u"
            ).select(F.col("v").alias("id"), "lbl")
            new_labels = (
                labels.unionByName(prop)
                .groupBy("id")
                .agg(F.min("lbl").alias("lbl"))
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels.select(
                    F.col("id").alias(id_col), F.col("lbl").alias("cluster_id")
                )
        labels.unpersist()
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_rounds} rounds "
            "(component diameter too deep — use small-star/large-star)"
        )
    finally:
        sym.unpersist()
