"""operators.spans — exact-substring span dedup: hand-computed span
boundaries, window chaining/splitting, the k-floor and cross-doc-only
contracts, and span_stats coverage math. (xxhash64 shingle keys are
engine-specific, so correctness pins are exact hand anchors, not a
DuckDB twin — same policy as operators/bloom.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.spans import (
    duplicate_spans,
    span_stats,
)

K = 3


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _spans(spark, *texts):
    docs = _docs(spark, *texts)
    out = {}
    for r in duplicate_spans(docs, k=K).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    return {d: sorted(v) for d, v in out.items()}


def test_shared_phrase_exact_boundaries(spark):
    # tokens 2..6 of doc0 == tokens 0..4 of doc1: "c d e f g" (5 tokens)
    # -> 3 overlapping 3-shingles -> one maximal span each side.
    got = _spans(spark, "a b c d e f g", "c d e f g x y")
    assert got[0] == [(2, 7, 3)]
    assert got[1] == [(0, 5, 3)]


def test_two_separated_repeats_make_two_spans(spark):
    got = _spans(
        spark,
        "p q r GAP1 GAP2 x y z",
        "p q r OTHER TOKENS x y z",
    )
    assert got[0] == [(0, 3, 1), (5, 8, 1)]
    assert got[1] == [(0, 3, 1), (5, 8, 1)]


def test_repeats_shorter_than_k_ignored(spark):
    # only 2 shared consecutive tokens < k=3 -> nothing flagged
    got = _spans(spark, "a b m n o", "a b x y z")
    assert got == {}


def test_within_doc_repeat_not_flagged(spark):
    # the phrase repeats INSIDE one doc only -> cross-doc rule skips it
    got = _spans(spark, "a b c a b c a b c", "totally different words here")
    assert got == {}


def test_k_validation(spark):
    with pytest.raises(ValueError):
        duplicate_spans(_docs(spark, "a b c"), k=1)


def test_span_stats_coverage_math(spark):
    docs = _docs(spark, "a b c d e f g", "c d e f g x y", "no dup here at all")
    stats = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["dup_bp"])
        for r in span_stats(docs, duplicate_spans(docs, k=K)).collect()
    }
    assert stats[0] == (7, 1, 5, 10000 * 5 // 7)
    assert stats[1] == (7, 1, 5, 10000 * 5 // 7)
    assert stats[2] == (5, 0, 0, 0)  # span-free doc still gets a row


# ---------------------------------------------------------------------------
# Round 6: adversarial boundary-error pins for the ExactSubstr
# equivalence theorem (spans.py module docstring) — the flagged token
# set must equal the union of cross-doc repeats >= k with TOKEN-EXACT
# boundaries; the only permitted loss is the k-floor.
# ---------------------------------------------------------------------------


def _brute_truth(texts, k):
    """Reference ExactSubstr-with-min-match-k: for every doc, the exact
    set of token positions covered by a k-gram that appears in some
    OTHER doc (= union of cross-doc repeats >= k, by the window-cover
    identity). O(n²) and character-exact — the oracle the distributed
    operator must match."""
    toks = [t.split() for t in texts]
    grams = [
        {tuple(tt[i : i + k]) for i in range(len(tt) - k + 1)}
        for tt in toks
    ]
    covered = {}
    for d, tt in enumerate(toks):
        other = set().union(
            *[g for j, g in enumerate(grams) if j != d]
        ) if len(texts) > 1 else set()
        pos = set()
        for i in range(len(tt) - k + 1):
            if tuple(tt[i : i + k]) in other:
                pos.update(range(i, i + k))
        covered[d] = pos
    return covered


def _flagged_positions(spans_by_doc):
    out = {}
    for d, spans in spans_by_doc.items():
        pos = set()
        for s, e, _ in spans:
            pos.update(range(s, e))
        out[d] = pos
    return out


@pytest.mark.parametrize(
    "texts",
    [
        # overlapping repeats sharing tokens (chained islands)
        ("a b c d e f g h", "x a b c d y", "z c d e f g w"),
        # adjacent repeats, gap exactly 0 (must fuse) and gap 1 (must split)
        ("p q r s t u v p q r", "p q r X s t u", "s t u Y p q r"),
        # repeat exactly at doc start and doc end
        ("m n o tail tail2", "head m n o", "m n o"),
        # periodic text: self-overlapping k-grams across docs
        ("a a a a a a", "b a a a a c", "a a a"),
        # exactly-k repeat (flag) next to a (k-1)-repeat (k-floor: miss)
        ("one two three four XX five six", "one two three ZZ five six"),
        # everything duplicated (whole-doc span)
        ("w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5"),
    ],
)
def test_boundary_error_is_zero_vs_brute_force(spark, texts):
    got = _flagged_positions(_spans(spark, *texts))
    want = _brute_truth(list(texts), K)
    for d in range(len(texts)):
        assert got.get(d, set()) == want[d], (
            d,
            texts[d],
            sorted(got.get(d, set())),
            sorted(want[d]),
        )


def test_spans_are_maximal_islands_not_fragments(spark):
    """Beyond position-set equality: the emitted spans must be MAXIMAL
    (no two adjacent/overlapping spans for one doc) — fragment spans
    would inflate n_spans stats even with the right coverage."""
    got = _spans(
        spark,
        "a b c d e f g h i j",
        "a b c d e Q f g h i j",
    )
    for d, spans in got.items():
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert s2 > e1, (d, spans)  # strictly separated islands


# ---------------------------------------------------------------------------
# Property: the docstring THEOREM, randomized. duplicate_spans must equal
# a brute-force reference that flags every k-window whose gram appears in
# >= 2 distinct docs and merges chained windows (gap-and-islands) — the
# "union of maximal cross-document repeats, token-exact boundaries"
# claim, exercised across random corpora from a tiny vocabulary (dense
# repeats, boundary merges, sub-k near-misses). Round 11, after the
# groupBy+join -> one-window-over-h rewrite.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = ["a", "b", "c", "d", "e", "f", "g", "h"]
_CORPUS = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=18),
    min_size=2,
    max_size=5,
)


def _ref_spans(token_docs, k):
    """Pure-Python duplicate_spans: tuple-gram counting (no hashes),
    same window-chaining rule (new span when pos > prev + k)."""
    from collections import defaultdict

    grams = defaultdict(set)
    for d, ts in token_docs:
        for i in range(max(len(ts) - k + 1, 0)):
            grams[tuple(ts[i : i + k])].add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for d, ts in token_docs:
        spans = []  # [start, last_pos, n_windows]
        for p in range(max(len(ts) - k + 1, 0)):
            if tuple(ts[p : p + k]) not in dup:
                continue
            if spans and p <= spans[-1][1] + k:
                spans[-1][1] = p
                spans[-1][2] += 1
            else:
                spans.append([p, p, 1])
        out |= {(d, s, last + k, nw) for s, last, nw in spans}
    return out


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_duplicate_spans_equals_bruteforce_reference(spark, corpus):
    token_docs = list(enumerate(corpus))
    df = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in token_docs],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(df, k=K).collect()
    }
    assert got == _ref_spans(token_docs, K)


def test_hot_occ_cap_path_is_value_identical(spark):
    """duplicate_spans(hot_occ_cap=...) docstring claim: the hash-
    aggregate hot path and the window path flag the SAME spans, on a
    corpus engineered so the cap BINDS both ways — a boilerplate
    shingle present in many docs (hot AND cross-doc: must be flagged)
    and a shingle self-repeated many times inside ONE doc (hot but
    single-doc: must stay unflagged), alongside ordinary sub-cap
    duplicates and unique text."""
    boiler = "all rights reserved by the original content owner"
    self_rep = "spam spam spam spam spam"
    rows = []
    for i in range(30):  # boilerplate in 30 docs -> 30+ occurrences
        rows.append((i, f"doc {i} unique words here {boiler} tail{i} t{i}"))
    rows.append((100, " ".join([self_rep] * 12) + " closing unique bits"))
    rows.append((101, "an ordinary pair of duplicated sentences right here"))
    rows.append((102, "an ordinary pair of duplicated sentences right here"))
    rows.append((103, "totally singular text with no duplication at all ok"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    base = sorted(
        map(tuple, duplicate_spans(df, k=5).collect())
    )
    capped = sorted(
        map(tuple, duplicate_spans(df, k=5, hot_occ_cap=10).collect())
    )
    assert capped == base and len(base) > 0
    # the cap actually bound: the boilerplate hashes exceed 10
    # occurrences, so the hot branch carried real rows (non-vacuity —
    # if nothing were hot the two plans would be trivially equal)
    flagged_docs = {r[0] for r in base}
    assert set(range(30)) <= flagged_docs          # boilerplate flagged
    assert 100 not in flagged_docs                 # self-repeat not
    assert {101, 102} <= flagged_docs
