"""operators.repetition: top n-gram math, deterministic tie-break,
short-doc fallback, DuckDB twin over the real corpus."""

from __future__ import annotations

import duckdb
import pytest

from sports_stats_data_pipeline_spark.operators.repetition import top_ngram_stats
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )


def test_top_bigram_count_and_char_share(spark):
    # bigrams of "a b a b a b c": a b ×3, b a ×2, b c ×1 — 13 chars total
    row = top_ngram_stats(_docs(spark, "a b a b a b c")).collect()[0]
    assert (row["top_gram"], row["top_gram_count"]) == ("a b", 3)
    assert row["top_gram_char_bp"] == 10000 * 3 * 3 // 13


def test_tie_breaks_to_lexicographically_largest_gram(spark):
    row = top_ngram_stats(_docs(spark, "x y z")).collect()[0]
    assert (row["top_gram"], row["top_gram_count"]) == ("y z", 1)


def test_short_doc_whole_text_gram_and_n_validation(spark):
    row = top_ngram_stats(_docs(spark, "hello")).collect()[0]
    assert (row["top_gram"], row["top_gram_count"]) == ("hello", 1)
    with pytest.raises(ValueError):
        top_ngram_stats(_docs(spark, "a"), n=0)


def test_every_doc_yields_exactly_one_row(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert top_ngram_stats(docs).count() == docs.count()


def test_corpus_matches_duckdb_twin(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["top_gram"], r["top_gram_count"], r["top_gram_char_bp"])
        for r in top_ngram_stats(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH t AS (
          SELECT doc_id, length(text) AS n_chars,
                 string_split_regex(text, '\\s+') AS toks
          FROM documents
        ), g AS (
          SELECT doc_id, n_chars,
                 unnest(CASE WHEN len(toks) >= 2
                   THEN list_transform(range(1, len(toks)),
                          p -> toks[p] || ' ' || toks[p+1])
                   ELSE [array_to_string(toks, ' ')] END) AS gram
          FROM t
        ), c AS (
          SELECT doc_id, n_chars, gram, count(*) AS cnt
          FROM g GROUP BY ALL
        )
        SELECT doc_id, gram,
               cnt,
               10000 * cnt * CAST(length(gram) AS BIGINT) // n_chars
        FROM c
        QUALIFY row_number() OVER (
          PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) = 1
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, gram, cnt, bp in want:
        assert got[doc_id] == (gram, cnt, bp), doc_id
