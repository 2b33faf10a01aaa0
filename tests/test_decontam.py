"""operators.decontam — benchmark n-gram decontamination vs a DuckDB
twin, plus the semantic anchors: benchmark members are fully
contaminated, disjoint docs are clean."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.decontam import (
    flag_contaminated,
)
from sports_stats_data_pipeline_spark.plans.documents import _SQL_SHINGLES
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
THRESH = 50
MAX_DF = 10


def _spark_result(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 5)
    out = flag_contaminated(
        docs, bench, threshold_pct=THRESH, max_bench_df=MAX_DF
    )
    return {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_overlap"],
            r["overlap_pct"],
            r["contaminated"],
        )
        for r in out.collect()
    }


def test_matches_duckdb_twin(spark):
    got = _spark_result(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""
            WITH sh AS (
              SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM documents
            ),
            idx AS (
              SELECT shingle FROM (
                SELECT unnest(shingles) AS shingle, doc_id
                FROM sh WHERE doc_id < 5
              )
              GROUP BY shingle
              HAVING COUNT(DISTINCT doc_id) <= {MAX_DF}
            ),
            hits AS (
              SELECT s.doc_id, COUNT(*) AS n_overlap
              FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh) s
              JOIN idx USING (shingle)
              GROUP BY s.doc_id
            )
            SELECT sh.doc_id,
                   CAST(len(sh.shingles) AS BIGINT) AS n_shingles,
                   CAST(COALESCE(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
                   CAST(100 * COALESCE(hits.n_overlap, 0)
                        // len(sh.shingles) AS BIGINT) AS overlap_pct,
                   CAST(CASE WHEN 100 * COALESCE(hits.n_overlap, 0)
                        // len(sh.shingles) >= {THRESH}
                        THEN 1 ELSE 0 END AS INTEGER) AS contaminated
            FROM sh LEFT JOIN hits ON sh.doc_id = hits.doc_id
            """
        ).fetchall()
    }
    assert got == want


def test_benchmark_members_are_fully_contaminated(spark):
    got = _spark_result(spark)
    for doc_id in range(0, 5):
        if doc_id in got:
            n_sh, n_ov, pct, flag = got[doc_id]
            assert pct == 100 and flag == 1, (doc_id, got[doc_id])


def test_disjoint_docs_are_clean(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf"),
            (2, "kilo lima mike november oscar papa quebec"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark question words here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contaminated(docs, bench).collect()
    }
    assert out == {1: 0, 2: 0}


def test_corpus_df_cap_drops_boilerplate_shingles(spark):
    # "the quick brown fox" boilerplate appears in the benchmark doc AND
    # in many corpus docs; with the cap, only the benchmark's unique
    # question text still counts as contamination evidence.
    boiler = "the quick brown fox jumps over the lazy dog"
    unique = "what is the airspeed velocity of an unladen swallow"
    rows = [(0, boiler + " " + unique)]  # the benchmark member
    rows += [(i, boiler + f" filler{i} words here") for i in range(1, 9)]
    rows += [(100, unique)]  # a true contamination: quotes the question
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)

    uncapped = {
        r["doc_id"]: r["n_overlap"]
        for r in flag_contaminated(docs, bench, threshold_pct=50).collect()
    }
    capped = {
        r["doc_id"]: r["n_overlap"]
        for r in flag_contaminated(
            docs, bench, threshold_pct=50, max_corpus_df=5
        ).collect()
    }
    # boilerplate-only docs lose their overlap entirely under the cap
    assert uncapped[1] > 0 and capped[1] == 0
    # the doc quoting the unique question keeps its evidence
    assert capped[100] > 0
    # benchmark member still flags itself through its unique shingles
    assert capped[0] > 0
