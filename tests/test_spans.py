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
