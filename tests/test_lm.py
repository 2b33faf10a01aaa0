"""operators.lm — char n-gram LM training + perplexity scoring vs a
DuckDB twin (tolerance 1e-5: per-doc double means are order-sensitive),
plus hand-computed anchors on a tiny corpus."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.lm import (
    score_perplexity,
    train_char_lm,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N = 3


def _duck_scores(train_pred: str):
    """Per-doc (n_grams, nll) from DuckDB: train on the docs matching
    ``train_pred``, score everything."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH g AS (
              SELECT doc_id,
                     substr(text, CAST(i AS INT), {N}) AS gram
              FROM documents,
                   UNNEST(range(1, length(text) - {N - 2})) AS t(i)
              WHERE length(text) >= {N}
            ),
            gc AS (
              SELECT gram, COUNT(*) AS cnt FROM g
              WHERE {train_pred} GROUP BY gram
            ),
            cc AS (
              SELECT substr(gram, 1, {N - 1}) AS ctx,
                     SUM(cnt) AS ctx_cnt
              FROM gc GROUP BY ctx
            ),
            v AS (
              SELECT COUNT(DISTINCT substr(gram, {N}, 1)) AS vs FROM gc
            ),
            s AS (
              SELECT g.doc_id,
                     COUNT(*) AS n_grams,
                     round(-avg(
                       CASE WHEN cc.ctx_cnt IS NULL
                            THEN -ln(CAST(v.vs AS DOUBLE))
                            ELSE ln((CAST(COALESCE(gc.cnt, 0) AS DOUBLE) + 1.0)
                                    / (CAST(cc.ctx_cnt AS DOUBLE)
                                       + 1.0 * v.vs))
                       END), 6) AS nll
              FROM g
              LEFT JOIN gc USING (gram)
              LEFT JOIN cc ON substr(g.gram, 1, {N - 1}) = cc.ctx
              CROSS JOIN v
              GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_grams, 0) AS BIGINT),
                   s.nll
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN s USING (doc_id)
            """
        ).fetchall()
    }


def _spark_scores(spark, train_filter):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_char_lm(docs.filter(train_filter), "text", n=N, add_k=1.0)
    out = score_perplexity(docs, "doc_id", "text", lm)
    return {r["doc_id"]: (r["n_grams"], r["nll"]) for r in out.collect()}


def _assert_close(got, want):
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        if want[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], abs=1e-5), d


def test_matches_duckdb_twin_self_scored(spark):
    # train == score corpus: every gram and context is in-model
    _assert_close(
        _spark_scores(spark, F.lit(True)), _duck_scores("TRUE")
    )


def test_matches_duckdb_twin_held_out(spark):
    # train on even doc_ids only: odd docs exercise the unseen-gram and
    # unseen-context smoothing branches
    _assert_close(
        _spark_scores(spark, F.col("doc_id") % 2 == 0),
        _duck_scores("doc_id % 2 = 0"),
    )


def test_hand_computed_anchor(spark):
    # corpus "abab": bigrams ab(2) ba(1); ctx a→2 b→1; V={a,b}=2
    corpus = spark.createDataFrame([("abab",)], "text string")
    lm = train_char_lm(corpus, "text", n=2, add_k=1.0)
    assert lm.vocab_size == 2
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "zq"), (3, "x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["nll"])
        for r in score_perplexity(docs, "doc_id", "text", lm).collect()
    }
    # P(b|a) = (2+1)/(2+2) = 0.75
    assert got[1] == (1, pytest.approx(round(-math.log(0.75), 6)))
    # unseen context "z" → uniform 1/V = 1/2
    assert got[2] == (1, pytest.approx(round(math.log(2), 6)))
    # too short: no grams, NULL nll
    assert got[3] == (0, None)


def test_in_domain_scores_below_shuffled(spark):
    # semantic anchor: real text must out-score character noise under a
    # model trained on real text
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_char_lm(docs, "text", n=N)
    noise = docs.select(
        "doc_id", F.reverse(F.col("text")).alias("text")
    ).select(
        "doc_id",
        F.translate("text", "etaoin", "zqxjkv").alias("text"),
    )
    real = score_perplexity(docs, "doc_id", "text", lm).agg(
        F.avg("ppl")
    ).first()[0]
    junk = score_perplexity(noise, "doc_id", "text", lm).agg(
        F.avg("ppl")
    ).first()[0]
    assert real < junk
