"""Triangulation for the NN-Descent DuckDB twins: a from-scratch pure-
Python reference of the SAME deterministic algorithm (hashlib md5,
left-fold IEEE doubles, total-order ranking) must agree bit-for-bit
with the generated CTE chain over many random corpora — no Spark in
the loop, so dozens of shapes run in seconds.

Together with test_nndescent's Spark↔DuckDB pins this gives three-way
agreement: Spark build == DuckDB chain == independent reference. A
generator bug that happened to mirror a Spark-side quirk would slip a
two-way pin; it cannot slip the reference, which shares no code with
either engine path.

Float contract (measured, not assumed): the three cosine kernels agree
to ~1 ulp but NOT bitwise at the |cos|=1 boundary — on an exact clone
pair Spark's fold yields 0.9999999999999999, DuckDB's
list_cosine_similarity CLAMPS to 1.0, and this file's Python fold
yields 1.0000000000000002 (all three measured on the same vectors).
This is rank-safe: no representable double lies strictly between 1.0
and either neighbor, so no third pair's sim can interleave and flip an
ordering; and it is value-safe through the operators' r4/micro-score
rounding. The assertions therefore compare pair sets and RANKS
exactly, sims within 1e-12, and ``score_r4`` within its 5e-5 rounding
radius. See functions/vectors.py for the documented contract.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb
import numpy as np
import pytest

from sports_stats_data_pipeline_spark.operators.nndescent import (
    graph_search_cte_parts,
    knn_graph_cte_parts,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos(a, b) -> float:
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _topk(edge_sims: dict, k: int):
    by_src = defaultdict(list)
    for (s, d), sim in edge_sims.items():
        by_src[s].append((d, sim))
    rows = []
    for s, lst in by_src.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for r, (d, sim) in enumerate(lst[:k], start=1):
            rows.append((s, d, sim, r))
    return rows


def ref_build(vecs: dict, k: int, rounds: int):
    """(id -> vector) -> [(src, dst, sim, rank)] — the module docstring
    algorithm re-derived from operators/nndescent.py's PROSE, not its
    code."""
    ids = list(vecs)
    h = {i: _md5(str(i)) for i in ids}
    planes = [vecs[i] for i in sorted(ids, key=lambda i: h[i])[:8]]
    bucket = {}
    for i in ids:
        b = 0
        for pid, pl in enumerate(planes, start=1):
            if _dot(vecs[i], pl) > 0:
                b += 1 << pid
        bucket[i] = b
    byb = defaultdict(list)
    for i in ids:
        byb[bucket[i]].append(i)
    pos = {}
    for b, members in byb.items():
        for p, i in enumerate(sorted(members, key=lambda j: h[j]), start=1):
            pos[i] = (b, p)
    posmap = {v: i for i, v in pos.items()}
    half = (k + 1) // 2
    cand = set()
    for i, (b, p) in pos.items():
        for o in range(-half, half + 1):
            if o == 0:
                continue
            j = posmap.get((b, p + o))
            if j is not None:
                cand.add((i, j))
    edges = _topk({(s, d): _cos(vecs[s], vecs[d]) for s, d in cand}, k)
    nb = max(1, len(ids) // 32)
    for rnd in range(rounds):
        und = set()
        for s, d, _, _ in edges:
            und.add((s, d))
            und.add((d, s))
        adj = defaultdict(list)
        for s, d in und:
            adj[s].append(d)
        non = set()
        for s, m in und:
            for d2 in adj[m]:
                if s != d2:
                    non.add((s, d2))
        rh = {i: _md5(f"{i}#r{rnd}") for i in ids}
        bb = {i: int(rh[i][:8], 16) % nb for i in ids}
        byb2 = defaultdict(list)
        for i in ids:
            byb2[bb[i]].append(i)
        pos2 = {}
        for b, members in byb2.items():
            for p, i in enumerate(
                sorted(members, key=lambda j: rh[j]), start=1
            ):
                pos2[i] = (b, p)
        pm2 = {v: i for i, v in pos2.items()}
        expl = set()
        for i, (b, p) in pos2.items():
            for o in (-2, -1, 1, 2):
                j = pm2.get((b, p + o))
                if j is not None:
                    expl.add((i, j))
        merged: dict = {}
        for s, d, sim, _ in edges:
            merged[(s, d)] = sim
        for s, d in non | expl:
            sim = _cos(vecs[s], vecs[d])
            prev = merged.get((s, d))
            merged[(s, d)] = sim if prev is None else max(prev, sim)
        edges = _topk(merged, k)
    return edges


def ref_search(edges, vecs, qids, k, beam, hops):
    h = {i: _md5(str(i)) for i in vecs}
    entry = min(vecs, key=lambda i: h[i])
    und = defaultdict(set)
    for s, d, _, _ in edges:
        und[s].add(d)
        und[d].add(s)
    best = {q: {entry: _cos(vecs[q], vecs[entry])} for q in qids}
    for _ in range(hops):
        for q in qids:
            cur = best[q]
            merged = dict(cur)
            for c in set(cur):
                for nxt in und[c]:
                    sim = _cos(vecs[q], vecs[nxt])
                    prev = merged.get(nxt)
                    merged[nxt] = sim if prev is None else max(prev, sim)
            best[q] = dict(
                sorted(merged.items(), key=lambda t: (-t[1], t[0]))[:beam]
            )
    out = []
    for q in qids:
        lst = sorted(
            ((c, s) for c, s in best[q].items() if c != q),
            key=lambda t: (-t[1], t[0]),
        )
        for r, (c, s) in enumerate(lst[:k], start=1):
            out.append((q, c, r, s))
    return out


def _duck(vecs: dict, sql: str):
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE corpus (id BIGINT, v DOUBLE[])")
        con.executemany(
            "INSERT INTO corpus VALUES (?, ?)",
            [(i, list(map(float, v))) for i, v in vecs.items()],
        )
        return con.execute(sql).fetchall()
    finally:
        con.close()


CASES = [
    # (n, dim, k, rounds, q_bound, beam, hops, seed)
    (1, 3, 1, 1, 1, 4, 1, 0),      # singleton: empty graph, empty search
    (5, 3, 3, 0, 3, 4, 1, 1),      # rounds=0: init-only graph
    (33, 8, 3, 2, 5, 6, 2, 2),     # crosses the nb=1 exploration bucket
    (64, 4, 5, 2, 8, 8, 2, 3),     # two exploration buckets
    (100, 8, 4, 3, 6, 8, 3, 4),    # deepest chain
]


@pytest.mark.parametrize("n,dim,k,rounds,qb,beam,hops,seed", CASES)
def test_cte_chain_matches_independent_reference(
    n, dim, k, rounds, qb, beam, hops, seed
):
    rng = np.random.RandomState(seed)
    vecs = {
        int(i): [float(x) for x in rng.randn(dim)] for i in range(n)
    }
    if n >= 10:
        # clones: exact-tie ranks must agree too (dst tie-break)
        vecs[n - 1] = list(vecs[0])
        vecs[n - 2] = list(vecs[1])

    parts, final = knn_graph_cte_parts("SELECT id, v FROM corpus", k, rounds)
    got = sorted(
        _duck(
            vecs,
            "WITH "
            + ",\n".join(parts)
            + f"\nSELECT src, dst, sim, rank FROM {final}",
        )
    )
    want = sorted(ref_build(vecs, k, rounds))
    # pairs + ranks exact; sims to 1e-12 (the |cos|=1 clamp note in the
    # module docstring — exact clone pairs differ by ~1 ulp by design)
    assert [(s, d, r) for s, d, _, r in got] == [
        (s, d, r) for s, d, _, r in want
    ]
    assert all(
        abs(a[2] - b[2]) <= 1e-12 for a, b in zip(got, want)
    )

    q_parts, q_out = graph_search_cte_parts(
        final,
        "gvec",
        f"SELECT id AS qid FROM corpus WHERE id < {qb}",
        k=min(3, k),
        beam=beam,
        hops=hops,
    )
    got_s = sorted(
        _duck(
            vecs,
            "WITH "
            + ",\n".join(parts + q_parts)
            + f"\nSELECT query_id, neighbor_id, rank, score_r4 FROM {q_out}",
        )
    )
    want_s = sorted(
        ref_search(
            want,  # the reference graph already built above
            vecs,
            [i for i in vecs if i < qb],
            k=min(3, k),
            beam=beam,
            hops=hops,
        )
    )
    assert [(a, b, r) for a, b, r, _ in got_s] == [
        (a, b, r) for a, b, r, _ in want_s
    ]
    for (_, _, _, s4), (_, _, _, s) in zip(got_s, want_s):
        assert abs(s4 - s) <= 5.0e-5  # half-away rounding radius
    if n == 1:
        assert got == [] and got_s == []
