"""Bucket-size cap guards for the LSH near-dup operators (100 TB skew
design): a duplicate-heavy corpus must NOT produce a quadratic candidate
set — super-buckets are skipped — while genuine near-dup pairs in a
heterogeneous corpus are still found.

The queries read a ``documents`` table from a scale-factor directory, so
each test writes its own adversarial corpus as parquet and points the
query at it.
"""

from __future__ import annotations

import random

import pytest

from sports_stats_data_pipeline_spark.plans.documents import (
    _MINHASH_BUCKET_CAP,
    _SIMHASH_BUCKET_CAP,
    neardup_minhash_pairs,
    simhash_neardup_pairs,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _write_documents(spark, path: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(
        [(i, "xx", t) for i, t in rows], schema="doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _distinct_text(rng: random.Random, n_tokens: int = 250) -> str:
    return " ".join(rng.choice(_WORDS) + str(rng.randrange(10000)) for _ in range(n_tokens))


@pytest.mark.parametrize(
    "query,cap",
    [
        (simhash_neardup_pairs, _SIMHASH_BUCKET_CAP),
        (neardup_minhash_pairs, _MINHASH_BUCKET_CAP),
    ],
)
def test_adversarial_duplicate_corpus_is_bounded(spark, tmp_path, query, cap):
    # every doc identical: every band bucket holds all docs (> cap), so
    # the candidate join must see NOTHING from them. n is chosen so the
    # query's own synthesized %7 near-dup copies (also all identical)
    # exceed the cap too — output must be fully empty, not quadratic.
    n = cap * 8
    boiler = "the same boilerplate page body repeated " * 5
    _write_documents(spark, str(tmp_path), [(i, boiler) for i in range(1, n + 1)])
    assert query(spark, str(tmp_path)).count() == 0


@pytest.mark.parametrize(
    "query", [simhash_neardup_pairs, neardup_minhash_pairs]
)
def test_heterogeneous_corpus_still_finds_neardups(spark, tmp_path, query):
    # distinct docs (long enough that the 4-token tail of the synthesized
    # %7 near-dup copies is a small signature perturbation): the copies
    # must be recovered — small buckets survive the cap.
    rng = random.Random(7)
    _write_documents(
        spark,
        str(tmp_path),
        [(i, _distinct_text(rng)) for i in range(1, 50)],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in query(spark, str(tmp_path)).collect()
    }
    expected = {(k, k + 1000000) for k in range(7, 50, 7)}
    # every emitted pair must be a genuine copy (no false positives), and
    # recall must be substantial — SimHash legitimately drops a copy whose
    # signature moved > 3 bits (measured: hamming 0-5 on this corpus), so
    # exact-set equality is not the contract.
    assert pairs <= expected
    assert len(pairs) >= 5


def test_ngram_block_cap_bounds_adversarial_block(spark, tmp_path):
    from sports_stats_data_pipeline_spark.plans.documents import (
        ngram_jaccard_pairs,
    )

    # 1200 same-lang, same-length-bucket docs: one block over the 1024
    # cap -> skipped outright, empty output instead of a 1.4M-pair join.
    boiler = "b" * 150
    _write_documents(
        spark, str(tmp_path), [(i, boiler) for i in range(1, 1201)]
    )
    assert ngram_jaccard_pairs(spark, str(tmp_path)).count() == 0


def test_embedding_cell_cap_bounds_adversarial_cell(spark, tmp_path):
    from sports_stats_data_pipeline_spark.plans.documents import (
        neardup_embedding_cosine_pairs,
    )

    rows = [(i, 3, [1.0, 0.0, 0.0, 0.0]) for i in range(1, 1201)]
    spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    assert neardup_embedding_cosine_pairs(spark, str(tmp_path)).count() == 0
