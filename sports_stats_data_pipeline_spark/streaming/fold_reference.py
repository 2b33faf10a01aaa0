"""Parallel pure-Python reference of the multi-batch greedy LSH
admission fold — the >=30x scale-validation referee for the 'sneardup'
streaming family.

Why this exists (round 9): the fold is ORDER-DEPENDENT state — a doc
admitted in batch i vetoes near-dups in batch i+1 — so it cannot be
candidate-sampled the way the pair families are (a sampled admission
would evolve a different store). That left the DuckDB unrolled-CTE fold
(:func:`..streaming.dedup_lsh.greedy_fold_cte_parts`) as the only
referee, and at 60x replica scale it ran ONE DuckDB core at 100% for
~44 min: measured row-group-bound (DuckDB parallelizes scans by fixed
~122k-row in-memory row groups; the clone corpus has fewer rows), not
SQL-shape-bound — see SCALING.md round 8. This module is the
triangulation pattern already proven for NN-Descent
(tests/test_nndescent_sql_reference.py): a from-scratch implementation
of the SAME deterministic algorithm, sharing no engine code, that
parallelizes trivially — signatures by doc chunk, the per-batch dup
decision by batch-side doc (given a frozen prior store, each doc's
verdict is independent).

Exact semantic twin of both engine paths, pinned in
tests/test_fold_reference.py (vs the DuckDB fold at sf0.001/sf0.01 on
the real corpus plus randomized synthetic corpora; vs the Spark
streaming execution transitively through the driver gate, and directly
at replica scale in test_scale_replica):

- tokens: regex split on ``\\s+`` (Spark ``F.split`` / DuckDB
  ``string_split_regex``);
- shingles: distinct word 3-grams, whole text when < 3 tokens;
- base hash: first 8 hex chars of md5(shingle) as int — 32-bit;
- signature: 8 Carter–Wegman permutations (functions.text constants,
  the ONE shared source of truth) min-folded per doc;
- bands: 4 keys of 2 rows each, ``"{b}|{mh_2b}|{mh_2b+1}"``;
- fold: per batch (``doc_id % n_batches``, ascending), a doc is
  dropped iff it verifies (integer Jaccard 10·|∩| >= 6·|∪| on shingle
  SETS) against (a) a smaller-id doc of its OWN batch through a band
  bucket of batch-side size <= cap, or (b) any admitted store doc
  through a band bucket of store-side size <= cap. The intra-batch
  prior side is the WHOLE batch — a doc that loses against the store
  still vetoes larger intra-batch ids. Survivors extend the store
  seen by later batches.

All arithmetic is exact (Python ints, frozenset ops) — bit-identical
admissions by construction, no float contract needed.
"""

from __future__ import annotations

import hashlib
import multiprocessing
import re
from collections import defaultdict
from typing import Iterable, Sequence

from ..functions.text import MINHASH_A, MINHASH_B, MINHASH_PRIME
from .dedup_lsh import BUCKET_CAP

_WS = re.compile(r"\s+")

#: signature/verify state shared with fork()ed workers (copy-on-write;
#: see _pool below — an explicit fork context, because the default
#: start method does not inherit module globals on every Python)
_G: dict = {}


def _shingle_set(text: str) -> frozenset[str]:
    toks = _WS.split(text)
    if len(toks) >= 3:
        return frozenset(
            f"{toks[p]} {toks[p + 1]} {toks[p + 2]}"
            for p in range(len(toks) - 2)
        )
    return frozenset((text,))


def _signature(item: tuple[int, str]) -> tuple[int, frozenset[str], tuple]:
    doc_id, text = item
    sh = _shingle_set(text)
    hs = [
        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in sh
    ]
    mh = [
        min((a * h + b) % MINHASH_PRIME for h in hs)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    bands = tuple(
        f"{j}|{mh[2 * j]}|{mh[2 * j + 1]}" for j in range(len(mh) // 2)
    )
    return doc_id, sh, bands


def _jaccard_ok(a: frozenset[str], b: frozenset[str]) -> bool:
    inter = len(a & b)
    return 10 * inter >= 6 * (len(a) + len(b) - inter)


def _dup_chunk(ids: Sequence[int]) -> list[int]:
    """Worker: dup verdict for a chunk of batch-side docs against the
    frozen prior state in _G (inherited via fork)."""
    sh = _G["sh"]
    bands = _G["bands"]
    batch_ok = _G["batch_ok"]
    store_ok = _G["store_ok"]
    out = []
    for n in ids:
        sn = sh[n]
        dup = False
        for bk in bands[n]:
            for p in batch_ok.get(bk, ()):
                if p < n and _jaccard_ok(sh[p], sn):
                    dup = True
                    break
            if dup:
                break
            for p in store_ok.get(bk, ()):
                if _jaccard_ok(sh[p], sn):
                    dup = True
                    break
            if dup:
                break
        if dup:
            out.append(n)
    return out


def _chunks(seq: Sequence, n: int) -> list[Sequence]:
    step = max(1, (len(seq) + n - 1) // n)
    return [seq[i : i + step] for i in range(0, len(seq), step)]


def greedy_fold_reference(
    docs: Iterable[tuple[int, str]],
    n_batches: int = 3,
    cap: int = BUCKET_CAP,
    processes: int | None = None,
) -> set[int]:
    """Admitted doc_ids of the greedy multi-batch fold over ``docs``
    (pairs of (doc_id, text); batch = doc_id % n_batches, batches run
    in ascending order). ``processes=0`` forces the serial path (used
    by the pin tests to cross-check the parallel one)."""
    docs = list(docs)
    if processes is None:
        processes = min(multiprocessing.cpu_count(), 32)

    if processes and len(docs) > 2000:
        # fetched lazily so the serial path (processes=0, the pin
        # tests' cross-check) stays pure on platforms without fork
        ctx = multiprocessing.get_context("fork")
        with ctx.Pool(processes) as pool:
            sigs = pool.map(
                _signature, docs, chunksize=max(1, len(docs) // (processes * 8))
            )
    else:
        sigs = [_signature(d) for d in docs]

    sh = {d: s for d, s, _ in sigs}
    bands = {d: b for d, _, b in sigs}
    batches: dict[int, list[int]] = defaultdict(list)
    for d in sh:
        batches[d % n_batches].append(d)

    store_bands: dict[str, list[int]] = defaultdict(list)
    admitted: set[int] = set()
    try:
        for i in range(n_batches):
            ids = sorted(batches.get(i, ()))
            batch_bucket: dict[str, list[int]] = defaultdict(list)
            for d in ids:
                for bk in bands[d]:
                    batch_bucket[bk].append(d)
            # prior-side caps, both sides (bounded-recall contract: a
            # super-bucket is skipped, not joined)
            batch_ok = {
                k: v for k, v in batch_bucket.items() if len(v) <= cap
            }
            store_ok = {
                k: v for k, v in store_bands.items() if len(v) <= cap
            }

            _G.update(
                sh=sh, bands=bands, batch_ok=batch_ok, store_ok=store_ok
            )
            if processes and len(ids) > 2000:
                # one fork per batch: children inherit the CURRENT
                # frozen store via copy-on-write — no pickling of the
                # shingle map
                with ctx.Pool(processes) as pool:
                    dup_lists = pool.map(
                        _dup_chunk, _chunks(ids, processes * 4)
                    )
                dups = {d for lst in dup_lists for d in lst}
            else:
                dups = set(_dup_chunk(ids))

            for d in ids:
                if d not in dups:
                    admitted.add(d)
                    for bk in bands[d]:
                        store_bands[bk].append(d)
    finally:
        # never leave the (large) worker-state snapshot pinned on an
        # exception — the module global outlives the call
        _G.clear()
    return admitted


def synthesize_neardup_corpus(
    base: Iterable[tuple[int, str]],
) -> list[tuple[int, str]]:
    """Python twin of plans.documents._NEARDUP_DOCS_SQL: the corpus plus
    a clone at doc_id + 1000000 with the tail marker for every
    doc_id % 7 == 0. Must stay byte-identical to that recipe or the
    referee diverges from the relation under test."""
    out = list(base)
    # iterate a SNAPSHOT: list.extend consumes its generator lazily
    # while appending, so iterating `out` itself would re-visit the
    # freshly appended clones mid-extend — today they fail the % 7
    # filter (clone ids are ≡ 1 mod 7), but a future constant change
    # would silently make clones-of-clones the SQL recipe never emits
    out.extend(
        (doc_id + 1_000_000, text + " near dup tail marker")
        for doc_id, text in list(out)
        if doc_id % 7 == 0
    )
    return out


def sneardup_admissions_reference(
    sf_dir: str, processes: int | None = None
) -> list[tuple[int, int]]:
    """(doc_id, admitted 0/1) rows for the driver-shaped sneardup
    family over ``{sf_dir}/documents.parquet`` — the full referee
    pipeline: read corpus, synthesize clones, run the 3-batch fold.
    Output order is doc_id-ascending (the comparison sorts anyway)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    docs = synthesize_neardup_corpus(base)
    admitted = greedy_fold_reference(docs, n_batches=3, processes=processes)
    return [(d, int(d in admitted)) for d, _ in sorted(docs)]
