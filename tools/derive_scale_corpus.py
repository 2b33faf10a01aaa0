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

    Round 11 adds two more adversarial shapes (both on by default):

    - ``funnel-cap bot``: a synthetic user appended to events whose
      first QUALIFYING funnel chain sits PAST the earliest-10k
      step-event truncation (1 view, 15 000 clicks at 0.5 s spacing,
      then a purchase 130 min after entry — inside the 240-min window
      but step-rank 15 002 > 10 000). The capped engine AND the
      cap-mirroring oracle must both report max_step 2 where an
      uncapped computation reports 3 — the first corpus where
      funnel_steps' truncation is value-RELEVANT, not just unhittable
      (round-10 verdict #3). The bot's 15 002 relevant events also
      trip attribute_conversions' exclusion guard (different
      semantics: EXCLUDE, not truncate).
    - ``hot near-dup document cluster``: ``doc_frac_pct`` (default 40)
      percent of documents rewritten to one shared base text plus a
      per-doc suffix token (``zz<doc_id % 23>``) — a single
      near-duplicate cluster holding ~40% of the corpus. Every LSH
      band bucket the cluster touches blows past the 64-doc caps, so
      the minhash/simhash/doc_clusters bucket caps must actually BIND
      (round-10 verdict #4) while the cold 60% keeps producing normal
      clone pairs; the cap-mirroring oracles must stay value-matched.

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


#: the funnel-cap bot's fixed identity (appended to events in skew
#: mode): chosen to collide with nothing — replica user ids stay below
#: STRIDE * (factor + 1) only for factors the key offset produces, and
#: no remap targets this id.
FUNNEL_BOT_USER = 88_888_777
#: clicks between the bot's entry view and its purchase: step-rank of
#: the purchase is FUNNEL_BOT_CLICKS + 2 — past funnel_steps'
#: max_events_per_user=10_000 — while 0.5 s spacing keeps the purchase
#: 130 min after entry, inside the 240-min conversion window.
FUNNEL_BOT_CLICKS = 15_000


def derive_skew(
    src: str,
    out: str,
    hot_user: int = 7,
    event_frac_pct: int = 40,
    hot_cust: int = 70,
    order_frac_pct: int = 30,
    hot_nation: int = 7,
    cust_frac_pct: int = 60,
    doc_frac_pct: int = 40,
) -> None:
    """Remaps use ``key % 100 < pct`` — deterministic, scale-free."""
    con = duckdb.connect()
    os.makedirs(out, exist_ok=True)
    passthrough = {
        t: f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        for t in ALL_TABLES
    }
    ev_path = f"{src}/events.parquet"
    ev_cols = ", ".join(
        f"CASE WHEN event_id % 100 < {event_frac_pct} "
        f"THEN {hot_user} ELSE user_id END AS user_id"
        if c == "user_id"
        else c
        for c in _cols(con, ev_path)
    )
    # funnel-cap bot (module docstring): one view, FUNNEL_BOT_CLICKS
    # clicks at 0.5 s spacing, one purchase at entry + 7 800 s. Placed
    # 30 days after the corpus' last event so it perturbs nothing
    # else's session/cohort structure; event ids continue from the
    # corpus max. Column values are in-domain (props mirrors the
    # corpus' {"k": n} shape) so downstream parsers see nothing new.
    bot_cols = ", ".join(
        {
            "event_id": "(SELECT max(event_id) FROM base) + 1 + i "
            "AS event_id",
            "ts": "(SELECT max(ts) FROM base) + INTERVAL 30 DAY "
            "+ to_microseconds(CASE WHEN i = 0 THEN CAST(0 AS BIGINT) "
            f"WHEN i <= {FUNNEL_BOT_CLICKS} THEN CAST(i AS BIGINT) "
            "* 500000 ELSE CAST(7800 AS BIGINT) * 1000000 END) AS ts",
            "user_id": f"{FUNNEL_BOT_USER} AS user_id",
            "event_type": "CASE WHEN i = 0 THEN 'view' "
            f"WHEN i <= {FUNNEL_BOT_CLICKS} THEN 'click' "
            "ELSE 'purchase' END AS event_type",
            "value": "1.0 + (i % 100) / 100.0 AS value",
            "props": "'{\"k\": ' || CAST(i % 100 AS VARCHAR) || '}' "
            "AS props",
        }.get(c, f"NULL AS {c}")
        for c in _cols(con, ev_path)
    )
    passthrough["events"] = (
        f"COPY (WITH base AS "
        f"(SELECT {ev_cols} FROM read_parquet('{ev_path}')) "
        f"SELECT * FROM base UNION ALL "
        f"SELECT {bot_cols} FROM "
        f"(SELECT unnest(range({FUNNEL_BOT_CLICKS + 2})) AS i))"
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
    # hot near-dup document cluster (module docstring): doc_frac_pct%
    # of docs become the lexicographically-first doc's text plus a
    # per-doc suffix token — near-duplicates of each other (high
    # Jaccard through the shared base) whose band buckets hold ~40% of
    # the corpus, far past the 64-doc LSH caps. n_chars is kept
    # CONSISTENT with the rewritten text (documents-family oracles
    # recompute lengths from text, but a derived corpus should never
    # carry an internally inconsistent row).
    doc_path = f"{src}/documents.parquet"
    d_cols = ", ".join(
        "CASE WHEN doc_id % 100 < "
        f"{doc_frac_pct} THEN hot.t || ' zz' || "
        "CAST(doc_id % 23 AS VARCHAR) ELSE text END AS text"
        if c == "text"
        else (
            "CASE WHEN doc_id % 100 < "
            f"{doc_frac_pct} THEN len(hot.t || ' zz' || "
            "CAST(doc_id % 23 AS VARCHAR)) ELSE n_chars END AS n_chars"
            if c == "n_chars"
            else c
        )
        for c in _cols(con, doc_path)
    )
    passthrough["documents"] = (
        f"COPY (SELECT {d_cols} FROM read_parquet('{doc_path}'), "
        f"(SELECT text AS t FROM read_parquet('{doc_path}') "
        f"ORDER BY doc_id LIMIT 1) hot)"
        f" TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in ALL_TABLES:
        con.execute(passthrough[t])
    print(
        f"skewed: {src} -> {out} (events {event_frac_pct}%->user "
        f"{hot_user} + funnel-cap bot user {FUNNEL_BOT_USER}, orders "
        f"{order_frac_pct}%->cust {hot_cust}, customers "
        f"{cust_frac_pct}%->nation {hot_nation}, docs "
        f"{doc_frac_pct}%->one near-dup cluster)"
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
