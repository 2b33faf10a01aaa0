"""streaming.dedup_lsh — incremental near-dedup against a persisted
LSH store: cross-batch dedup, intra-batch first-wins, idempotent replay
of the admit step."""

from __future__ import annotations

from sports_stats_data_pipeline_spark.streaming.dedup_lsh import (
    dedup_batch_against_store,
    run_streaming_neardup_dedup,
)

# long word-distinct texts so shingle sets are meaningful; B is a tail-
# variant of A (a near dup at Jaccard >= 0.6), E likewise of C.
_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
_B = _A + " extra tail words"
_C = "kilo lima mike november oscar papa quebec romeo sierra tango"
_E = _C + " trailing marker"
_D = "unrelated totally different words about completely other topics here now"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_streaming_dedup_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    # batch 1: A and C; batch 2: near-dup of A (drop), new D (keep),
    # near-dup of C (drop). maxFilesPerTrigger=1 -> one batch per file.
    _write_batch(spark, landing, [(1, _A), (2, _C)])
    _write_batch(spark, landing, [(10, _B), (11, _D), (12, _E)])

    out = run_streaming_neardup_dedup(spark, landing, store)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == [
        1,
        2,
        11,
    ]


def test_intra_batch_first_wins(spark, tmp_path):
    store = str(tmp_path / "store")  # no store yet: purely intra-batch
    batch = spark.createDataFrame(
        [(5, _A), (3, _B), (9, _C)], "doc_id long, text string"
    )
    novel = dedup_batch_against_store(spark, batch, store)
    # 3 < 5 and A~B: the smaller doc_id survives
    assert sorted(r["doc_id"] for r in novel.select("doc_id").collect()) == [
        3,
        9,
    ]


def test_admit_is_replay_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    _write_batch(spark, landing, [(1, _A), (2, _C)])
    first = run_streaming_neardup_dedup(spark, landing, store)
    n1 = first.count()
    # simulate a replay of the same data with a fresh checkpoint (the
    # harsher case: offsets lost, files re-delivered)
    import shutil

    shutil.rmtree(store + ".checkpoint")
    again = run_streaming_neardup_dedup(spark, landing, store)
    assert again.count() == n1 == 2
    assert sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    ) == [1, 2]
