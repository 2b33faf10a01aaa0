#!/usr/bin/env python
"""Derive the scale/skew validation corpora from a testdata SF dir.

Reproduces, from a fresh checkout, the corpora behind the repo's 100-TB
re-validations (NOTES.md rounds 4-6; previously /tmp scripts only):

``--mode replicate --factor N``
    N-fold replica of the fact tables with CONSISTENT key offsets
    (replica r adds ``r * 10_000_000`` to every surrogate/foreign key,
    so joins stay valid and every replica is disjoint). ``region`` and
    ``nation`` stay single — dims stay dims. ``documents`` and
    ``embeddings`` replicate with IDENTICAL payloads under fresh ids:
    an adversarially DENSE dedup workload (every doc gains N-1
    byte-identical copies; true duplicate pairs grow ~quadratically).

``--mode skew``
    The adversarial-skew corpus: a fraction of events remapped onto one
    hot user, a fraction of orders onto one hot customer (defaults are
    the round-6 recipe — 40% of events -> user 7, 30% of orders ->
    custkey 70), and a fraction of customers into one hot nation
    (round-4 recipe — 60% -> nationkey 7). Hot keys are chosen to pass
    the driver queries' modular filters so the hot paths execute.

Usage::

    python tools/derive_scale_corpus.py --src /root/testdata/sf0.1 \
        --out /tmp/scale10 --mode replicate --factor 10
    python tools/derive_scale_corpus.py --src /root/testdata/sf0.1 \
        --out /tmp/skewed --mode skew

Then run the env-gated re-validation suite against the result::

    SPARK_GRAFT_SCALE_DIR=/tmp/scale10 python -m pytest \
        tests/test_scale_replica.py -q
    SPARK_GRAFT_SKEW_DIR=/tmp/skewed python -m pytest \
        tests/test_scale_replica.py -q

DuckDB does the rewrite (no Spark session needed); pass-through columns
are discovered from the parquet schema, so a regenerated testdata
layout with extra columns derives without edits.
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: per-replica key stride — far above any key range at the test SFs.
STRIDE = 10_000_000

#: key columns offset per replica (consistent: FK pairs share strides).
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: dimension tables copied single in replicate mode.
SINGLE = ("region", "nation")

ALL_TABLES = list(SINGLE) + list(KEY_COLS)


def _cols(con: duckdb.DuckDBPyConnection, path: str) -> list[str]:
    return [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')"
        ).fetchall()
    ]


#: max byte-identical copies of one document text in a derived replica
#: (round 9). The minhash bucket cap is 64: a clone clique LARGER than
#: the cap puts every one of its band buckets over the cap, and the
#: bounded-recall contract SKIPS them — at factor 100 a naive 100-fold
#: replication would cap away essentially every near-dup pair, i.e.
#: validate the dedup families on an empty workload (the 60x run only
#: stayed in-regime because 60 <= 64). Replica groups of ``cap`` copies
#: therefore get a group token INTERLEAVED between every pair of words
#: (``replace(text, ' ', ' sdg<g> ')``): every 3-gram shingle of a
#: salted group contains its group token, so groups are shingle-
#: DISJOINT (cross-group Jaccard 0, no shared band keys) and each
#: clique is exactly min(cap, factor) — maximal in-regime density at
#: any factor. Single-token docs have no spaces and stay identical
#: across groups; their over-cap buckets are skipped identically by
#: engine and oracle (the mirrored contract).
DOC_DUP_CAP = 50


def derive_replicate(
    src: str, out: str, factor: int, doc_dup_cap: int = DOC_DUP_CAP
) -> None:
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)
    for t in SINGLE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEY_COLS.items():
        path = f"{src}/{t}.parquet"
        sel = ", ".join(
            f"{c} + r.rep * {STRIDE} AS {c}"
            if c in keys
            else (
                f"CASE WHEN r.rep // {doc_dup_cap} = 0 THEN text "
                f"ELSE replace(text, ' ', ' sdg' || "
                f"CAST(r.rep // {doc_dup_cap} AS VARCHAR) || ' ') "
                f"END AS text"
                if t == "documents" and c == "text" and factor > doc_dup_cap
                else c
            )
            for c in _cols(con, path)
        )
        con.execute(
            f"""COPY (
              SELECT {sel}
              FROM read_parquet('{path}'),
                   (SELECT unnest(range({factor})) AS rep) r
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)"""
        )
    salted = " (doc clone cliques salted to <= "
    print(
        f"replicated x{factor}: {src} -> {out}"
        + (f"{salted}{doc_dup_cap})" if factor > doc_dup_cap else "")
    )


def derive_skew(
    src: str,
    out: str,
    hot_user: int = 7,
    event_frac_pct: int = 40,
    hot_cust: int = 70,
    order_frac_pct: int = 30,
    hot_nation: int = 7,
    cust_frac_pct: int = 60,
) -> None:
    """Remaps use ``key % 100 < pct`` — deterministic, scale-free."""
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)
    passthrough = {
        t: f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        for t in ALL_TABLES
    }
    ev_cols = ", ".join(
        f"CASE WHEN event_id % 100 < {event_frac_pct} "
        f"THEN {hot_user} ELSE user_id END AS user_id"
        if c == "user_id"
        else c
        for c in _cols(con, f"{src}/events.parquet")
    )
    passthrough["events"] = (
        f"COPY (SELECT {ev_cols} FROM read_parquet('{src}/events.parquet'))"
        f" TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    o_cols = ", ".join(
        f"CASE WHEN o_orderkey % 100 < {order_frac_pct} "
        f"THEN {hot_cust} ELSE o_custkey END AS o_custkey"
        if c == "o_custkey"
        else c
        for c in _cols(con, f"{src}/orders.parquet")
    )
    passthrough["orders"] = (
        f"COPY (SELECT {o_cols} FROM read_parquet('{src}/orders.parquet'))"
        f" TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )
    c_cols = ", ".join(
        f"CASE WHEN c_custkey % 100 < {cust_frac_pct} "
        f"THEN {hot_nation} ELSE c_nationkey END AS c_nationkey"
        if c == "c_nationkey"
        else c
        for c in _cols(con, f"{src}/customer.parquet")
    )
    passthrough["customer"] = (
        f"COPY (SELECT {c_cols} FROM read_parquet('{src}/customer.parquet'))"
        f" TO '{out}/customer.parquet' (FORMAT PARQUET)"
    )
    for t in ALL_TABLES:
        con.execute(passthrough[t])
    print(
        f"skewed: {src} -> {out} (events {event_frac_pct}%->user "
        f"{hot_user}, orders {order_frac_pct}%->cust {hot_cust}, "
        f"customers {cust_frac_pct}%->nation {hot_nation})"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--mode", choices=["replicate", "skew"], default="replicate"
    )
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--doc-dup-cap", type=int, default=DOC_DUP_CAP,
        help="max byte-identical copies per document text (clone "
             "cliques beyond this get shingle-disjoint group salts so "
             "the dedup families stay inside the bucket-cap regime)",
    )
    args = ap.parse_args()
    if args.mode == "replicate":
        derive_replicate(args.src, args.out, args.factor, args.doc_dup_cap)
    else:
        derive_skew(args.src, args.out)


if __name__ == "__main__":
    main()
