"""JSONL corpus ingest/export: round-trip fidelity, malformed-line
contract (all three modes), and a DuckDB cross-engine read of the same
shards — the interchange format must not be a Spark-only dialect."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sports_stats_data_pipeline_spark.sources.corpus_files import (
    corrupt_line_report,
    read_jsonl,
    read_text_docs,
    write_jsonl,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs.jsonl")
    write_jsonl(docs, out, shards=3)
    back = read_jsonl(spark, out, DOC_SCHEMA, mode="FAILFAST")
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.select(docs.columns).collect(), key=lambda r: r["doc_id"])
    assert a == b
    # gzip default: one .gz shard per requested partition
    shards = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(shards) == 3


def test_jsonl_duckdb_reads_spark_shards(spark, tmp_path):
    """The written shards are plain JSONL: DuckDB must agree row-for-row."""
    import duckdb

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs.jsonl")
    write_jsonl(docs, out, shards=2)
    con = duckdb.connect()
    oracle = con.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM "
        f"read_json('{out}/part-*.json.gz', format='newline_delimited', "
        "columns={doc_id:'BIGINT', text:'VARCHAR', lang:'VARCHAR', "
        "source:'VARCHAR', n_chars:'BIGINT'}) ORDER BY doc_id"
    ).fetchall()
    con.close()
    got = [
        tuple(r)
        for r in sorted(docs.collect(), key=lambda r: r["doc_id"])
    ]
    assert got == oracle


@pytest.fixture()
def mixed_jsonl(tmp_path):
    """Six lines: four clean, one syntactically broken, one non-object."""
    lines = [
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}',
        '{"doc_id": 2, "text": "bravo", "lang": "de", "source": "s", "n_chars": 5}',
        '{"doc_id": 3, "text": "br{oken',
        '{"doc_id": 4, "text": "charlie", "lang": "fr", "source": "t", "n_chars": 7}',
        "[1, 2, 3]",
        '{"doc_id": 6, "text": "delta", "lang": "en", "source": "t", "n_chars": 5}',
    ]
    p = tmp_path / "mixed"
    p.mkdir()
    with gzip.open(p / "shard-0.jsonl.gz", "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return str(p)


def test_permissive_routes_corrupt_lines(spark, mixed_jsonl):
    df = read_jsonl(spark, mixed_jsonl, DOC_SCHEMA)  # PERMISSIVE default
    rows = df.collect()
    assert len(rows) == 6
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    ok = [r for r in rows if r["_corrupt_record"] is None]
    assert len(bad) == 2 and len(ok) == 4
    # broken lines carry the raw text and NULL declared fields
    assert {r["_corrupt_record"] for r in bad} == {'{"doc_id": 3, "text": "br{oken', "[1, 2, 3]"}
    assert all(r["text"] is None for r in bad)
    assert sorted(r["doc_id"] for r in ok) == [1, 2, 4, 6]
    rep = corrupt_line_report(df).collect()[0]
    assert (rep["n_lines"], rep["n_corrupt"], rep["n_ok"]) == (6, 2, 4)
    assert rep["n_ok_with_doc_id"] == 4


def test_dropmalformed_and_failfast(spark, mixed_jsonl):
    dropped = read_jsonl(spark, mixed_jsonl, DOC_SCHEMA, mode="DROPMALFORMED")
    assert "_corrupt_record" not in dropped.columns
    assert sorted(r["doc_id"] for r in dropped.collect()) == [1, 2, 4, 6]
    strict = read_jsonl(spark, mixed_jsonl, DOC_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        strict.collect()


def test_reader_rejects_bad_arguments(spark, mixed_jsonl):
    with pytest.raises(ValueError, match="mode"):
        read_jsonl(spark, mixed_jsonl, DOC_SCHEMA, mode="LENIENT")
    with pytest.raises(ValueError, match="schema"):
        read_jsonl(spark, mixed_jsonl, StructType([]))
    clash = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError, match="collides"):
        read_jsonl(spark, mixed_jsonl, clash)


def test_read_text_docs_line_and_whole_file(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n", encoding="utf-8")
    (p / "b.txt").write_text("solo", encoding="utf-8")
    by_line = read_text_docs(spark, str(p))
    assert sorted(r["text"] for r in by_line.collect()) == [
        "line one",
        "line two",
        "solo",
    ]
    by_file = read_text_docs(spark, str(p), whole_file=True)
    rows = {os.path.basename(r["file"]): r["text"] for r in by_file.collect()}
    assert rows == {"a.txt": "line one\nline two\n", "b.txt": "solo"}


def test_corrupt_report_requires_permissive_column(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="_corrupt_record"):
        corrupt_line_report(df)
