"""CSV / ORC corpus round-trips: fidelity, the malformed-row contract
(CSV shares the JSONL dials), newline/quote escaping under the
splittable single-line contract, ORC schema pinning + pushdown, and a
DuckDB cross-engine read of the CSV shards."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sports_stats_data_pipeline_spark.sources.corpus_files import (
    corrupt_line_report,
    read_csv,
    read_orc,
    write_csv,
    write_orc,
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


def test_csv_roundtrip_exact_incl_awkward_text(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    # adversarial rows: embedded newline, quote, comma, empty vs NULL.
    # Embedded newlines force the multi_line read path (module-doc
    # trade: quoted newlines span lines, so the splittable single-line
    # scan cannot carry them).
    extra = spark.createDataFrame(
        [
            (900001, 'line1\nline2 and "quoted", comma', "en", "t", 1),
            (900002, None, None, "t", None),
            (900003, "", "xx", "t", 0),
        ],
        DOC_SCHEMA,
    )
    out = str(tmp_path / "docs.csv")
    write_csv(docs.unionByName(extra), out, shards=3)
    back = read_csv(
        spark, out, DOC_SCHEMA, mode="FAILFAST", multi_line=True
    )
    a = sorted(
        docs.unionByName(extra).collect(), key=lambda r: r["doc_id"]
    )
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    # CSV cannot distinguish empty string from NULL without a quirk
    # convention; Spark reads '' back as NULL — normalize expectation
    a = [
        tuple(None if v == "" else v for v in r) for r in map(tuple, a)
    ]
    assert [tuple(r) for r in b] == a
    assert len(glob.glob(os.path.join(out, "part-*.csv.gz"))) == 3


def test_csv_singleline_roundtrip_newline_free(spark, tmp_path):
    # the splittable default path: newline-free corpus round-trips exact
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        ~F.col("text").contains("\n")
    )
    out = str(tmp_path / "docs1.csv")
    write_csv(docs, out, shards=2)
    back = read_csv(spark, out, DOC_SCHEMA, mode="FAILFAST")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_csv_malformed_contract(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,s,2\n"
        "not-a-number,bad,en,s,3\n"  # doc_id unparseable
        "2,fine,fr,s,4\n"
    )
    perm = read_csv(spark, str(p), DOC_SCHEMA, mode="PERMISSIVE")
    rows = perm.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
    rep = corrupt_line_report(perm).collect()[0]
    assert (rep["n_lines"], rep["n_corrupt"], rep["n_ok"]) == (3, 1, 2)
    dropped = read_csv(spark, str(p), DOC_SCHEMA, mode="DROPMALFORMED")
    # upstream quirk (module doc): count() counts RAW records under
    # DROPMALFORMED; column-touching execution sees the drop
    assert dropped.count() == 3
    assert len(dropped.collect()) == 2
    with pytest.raises(Exception):
        read_csv(spark, str(p), DOC_SCHEMA, mode="FAILFAST").collect()
    with pytest.raises(ValueError):
        read_csv(spark, str(p), DOC_SCHEMA, mode="nope")


def test_csv_duckdb_cross_engine(spark, tmp_path):
    import duckdb

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        # keep the cross-engine slice newline-free: DuckDB's reader
        # treats raw newlines as record breaks (no escape dialect)
        ~F.col("text").contains("\n")
    )
    out = str(tmp_path / "docs.csv")
    write_csv(docs, out, shards=2, compression="none")
    con = duckdb.connect()
    n, s = con.execute(
        f"SELECT COUNT(*), SUM(n_chars) FROM read_csv('{out}/*.csv', "
        "header=true)"
    ).fetchone()
    con.close()
    want = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars")
    ).collect()[0]
    assert (n, s) == (want[0], want[1])


def test_orc_roundtrip_and_schema_pin(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders.orc")
    write_orc(orders, out, shards=2)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    back = read_orc(spark, out, schema)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    wrong = StructType([StructField("nope", LongType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        read_orc(spark, out, wrong)


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders.orc")
    write_orc(orders, out)
    q = read_orc(spark, out).filter(F.col("o_orderkey") < 100).select(
        "o_orderkey"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)" in plan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan
