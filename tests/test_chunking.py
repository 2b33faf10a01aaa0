"""operators.chunking: window math, overlap/reconstruction invariants,
DuckDB twin replay on the real corpus."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.chunking import chunk_documents
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame(
        [(doc_id, text)], schema="doc_id long, text string"
    )


def test_chunk_windows_and_tail(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    rows = (
        chunk_documents(_doc(spark, text), chunk_tokens=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["start_token"] for r in rows] == [0, 3, 6, 9]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[3]["chunk_text"] == "t9"  # truncated tail, no padding


def test_chunk_overlap_is_suffix_prefix(spark):
    text = " ".join(f"w{i}" for i in range(23))
    rows = (
        chunk_documents(_doc(spark, text), chunk_tokens=8, stride=5)
        .orderBy("chunk_idx")
        .collect()
    )
    for a, b in zip(rows, rows[1:]):
        overlap = a["chunk_text"].split(" ")[5:]  # last chunk-stride toks
        assert b["chunk_text"].split(" ")[: len(overlap)] == overlap


def test_nonoverlapping_mode_reconstructs_exactly(spark):
    text = " ".join(f"x{i}" for i in range(17))
    rows = (
        chunk_documents(_doc(spark, text), chunk_tokens=5, stride=5)
        .orderBy("chunk_idx")
        .collect()
    )
    assert " ".join(r["chunk_text"] for r in rows) == text
    assert sum(r["n_chunk_tokens"] for r in rows) == 17


def test_chunk_param_validation(spark):
    import pytest

    df = _doc(spark, "a b c")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0, stride=0)


def test_chunk_corpus_invariants_and_duckdb_twin(spark):
    docs = load_table(spark, SF_DIR, "documents")
    chunks = chunk_documents(docs, chunk_tokens=32, stride=24)
    got = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("n_chunk_tokens").alias("max_ct"),
            F.sum(F.when(F.col("chunk_idx") == 0, F.col("n_chunk_tokens"))).alias(
                "first_ct"
            ),
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(
        """
        WITH t AS (
          SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n
          FROM documents
        )
        SELECT doc_id,
               (n - 1) // 24 + 1 AS n_chunks,
               least(n, 32) AS first_ct
        FROM t ORDER BY doc_id
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["doc_id"], g["n_chunks"], g["first_ct"]) == w
        assert g["max_ct"] <= 32
