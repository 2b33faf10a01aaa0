"""Contrastive-pair mining: probe-all equals an exact numpy brute-force
reference (positives and hard negatives), the semi-hard band drops only
the above-best-positive negatives, and the mined set is deterministic."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.mining import (
    mine_contrastive_pairs,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K_POS, K_NEG = 2, 4


def ANCHORS():
    return F.col("vec_id") < 6


def _numpy_reference(vecs, labels, anchor_ids, semi_hard=False):
    """Exact mining over all candidates, micro-int scores, id tie-break."""
    ids = sorted(vecs)
    out = {}
    for a in anchor_ids:
        va = vecs[a] / np.linalg.norm(vecs[a])
        scored = []
        for n in ids:
            if n == a:
                continue
            vn = vecs[n] / np.linalg.norm(vecs[n])
            micro = math.floor(float(np.dot(va, vn)) * 1_000_000)
            scored.append((micro, n, int(labels[n] == labels[a])))
        pos = sorted(
            [s for s in scored if s[2] == 1], key=lambda s: (-s[0], s[1])
        )
        neg = [s for s in scored if s[2] == 0]
        if semi_hard and pos:
            best = pos[0][0]
            neg = [s for s in neg if s[0] < best]
        neg = sorted(neg, key=lambda s: (-s[0], s[1]))
        out[a] = (
            [(n, r + 1, m) for r, (m, n, _) in enumerate(pos[:K_POS])],
            [(n, r + 1, m) for r, (m, n, _) in enumerate(neg[:K_NEG])],
        )
    return out


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings")
    rows = df.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    return df, vecs, labels


@pytest.mark.parametrize("semi_hard", [False, True])
def test_probe_all_matches_numpy_reference(spark, emb, semi_hard):
    df, vecs, labels = emb
    got = {}
    res = mine_contrastive_pairs(
        df,
        ANCHORS(),
        k_pos=K_POS,
        k_neg=K_NEG,
        n_cells=4,
        n_probe=4,  # probe-all: exact
        semi_hard=semi_hard,
    ).collect()
    for r in res:
        got.setdefault(r["anchor_id"], ([], []))[
            0 if r["is_positive"] else 1
        ].append((r["neighbor_id"], r["rank"], r["cos_micro"]))
    anchor_ids = [i for i in vecs if i < 6]
    ref = _numpy_reference(vecs, labels, anchor_ids, semi_hard=semi_hard)
    for a in anchor_ids:
        gp = sorted(got.get(a, ([], []))[0], key=lambda t: t[1])
        gn = sorted(got.get(a, ([], []))[1], key=lambda t: t[1])
        assert gp == ref[a][0], f"positives differ for anchor {a}"
        assert gn == ref[a][1], f"negatives differ for anchor {a}"


def test_semi_hard_is_a_subset_and_below_best_positive(spark, emb):
    df, _, _ = emb
    full = mine_contrastive_pairs(
        df, ANCHORS(), k_pos=K_POS, k_neg=10**6, n_cells=4, n_probe=4
    )
    semi = mine_contrastive_pairs(
        df, ANCHORS(), k_pos=K_POS, k_neg=10**6, n_cells=4, n_probe=4,
        semi_hard=True,
    )
    full_rows = {
        (r["anchor_id"], r["neighbor_id"], r["is_positive"]): r["cos_micro"]
        for r in full.collect()
    }
    best_pos = {}
    for (a, _n, p), m in full_rows.items():
        if p:
            best_pos[a] = max(best_pos.get(a, -(10**9)), m)
    for r in semi.collect():
        key = (r["anchor_id"], r["neighbor_id"], r["is_positive"])
        assert key in full_rows
        if not r["is_positive"] and r["anchor_id"] in best_pos:
            assert r["cos_micro"] < best_pos[r["anchor_id"]]


def test_partial_probe_recall_and_determinism(spark, emb):
    """n_probe < n_cells is approximate: every mined pair must still be a
    true candidate (correct label side, exact score), and two runs agree
    exactly."""
    df, vecs, labels = emb
    kw = dict(k_pos=K_POS, k_neg=K_NEG, n_cells=4, n_probe=1)
    a = sorted(map(tuple, mine_contrastive_pairs(df, ANCHORS(), **kw).collect()))
    b = sorted(map(tuple, mine_contrastive_pairs(df, ANCHORS(), **kw).collect()))
    assert a == b
    for anchor_id, neighbor_id, is_pos, _rank, micro in a:
        assert is_pos == int(labels[anchor_id] == labels[neighbor_id])
        va = vecs[anchor_id] / np.linalg.norm(vecs[anchor_id])
        vn = vecs[neighbor_id] / np.linalg.norm(vecs[neighbor_id])
        assert micro == math.floor(float(np.dot(va, vn)) * 1_000_000)
