"""Streaming quality scoring == batch scoring: training once, persisting
the model, and streaming the corpus through in micro-batches must yield
exactly the batch scorer's per-document rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.lm import (
    score_perplexity,
    train_char_lm,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table
from sports_stats_data_pipeline_spark.streaming.quality import (
    load_char_lm,
    run_streaming_quality,
    save_char_lm,
)

SF = "/root/testdata/sf0.001"
NLL_MAX = 0.83


def test_streamed_scores_equal_batch_scores(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_char_lm(docs.filter(F.col("doc_id") % 2 == 0), "text", n=3)
    model_path = str(tmp_path / "model")
    save_char_lm(lm, model_path)

    # model round-trips through parquet intact
    lm2 = load_char_lm(spark, model_path)
    assert (lm2.n, lm2.add_k, lm2.vocab_size) == (lm.n, lm.add_k, lm.vocab_size)
    assert lm2.grams.count() == lm.grams.count()

    # stage the corpus as two parquet "arrival" batches
    src = str(tmp_path / "arrivals")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(src + "/b0")
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(src + "/b1")

    sink = str(tmp_path / "scored")
    streamed = run_streaming_quality(
        spark, src, model_path, sink, nll_keep_max=NLL_MAX
    )

    batch = score_perplexity(docs, "doc_id", "text", lm).select(
        "doc_id",
        "n_grams",
        "nll",
        F.when(F.col("nll").isNotNull() & (F.col("nll") <= NLL_MAX), 1)
        .otherwise(0)
        .alias("keep"),
    )

    def rows(df):
        return sorted(
            (r["doc_id"], r["n_grams"], r["nll"], r["keep"])
            for r in df.collect()
        )

    got, want = rows(streamed), rows(batch)
    assert len(got) == 500
    assert got == want
    # the gate actually separates: both classes present
    keeps = {r[3] for r in got}
    assert keeps == {0, 1}


def test_replayed_batch_overwrites_not_appends(spark, tmp_path):
    # foreachBatch is at-least-once: simulate a replay by re-running the
    # drained stream with its checkpoint intact (committed batches are
    # re-listed, none re-fire) and by checking the sink is keyed per
    # batch id — a re-run of batch N overwrites batch=N, so sink row
    # count equals input doc count, never a multiple of it.
    import os

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(100)
    lm = train_char_lm(docs, "text", n=3)
    model_path = str(tmp_path / "model")
    save_char_lm(lm, model_path)
    src = str(tmp_path / "arrivals")
    docs.coalesce(1).write.parquet(src + "/b0")
    sink = str(tmp_path / "scored")

    first = run_streaming_quality(spark, src, model_path, sink, nll_keep_max=5.0)
    n_first = first.count()
    assert n_first == 100
    # sink layout is batch-id keyed (the idempotence mechanism)
    assert any(d.startswith("batch=") for d in os.listdir(sink))
    # second drain over the same checkpoint: no duplicates appear
    again = run_streaming_quality(spark, src, model_path, sink, nll_keep_max=5.0)
    assert again.count() == n_first
