"""streaming.dedup_lsh — incremental near-dedup against a persisted
LSH store: cross-batch dedup, intra-batch first-wins, idempotent replay
of the admit step, and a DuckDB value twin of the GREEDY multi-batch
admission fold. Since round 8 the fold generator lives in the package
(greedy_fold_cte_parts) and ALSO backs the driver's multi-batch
'sneardup' oracle; this suite pins it on a crafted greedy triple and a
real 3-batch stream."""

from __future__ import annotations

from sports_stats_data_pipeline_spark.streaming.dedup_lsh import (
    BUCKET_CAP,
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


def _greedy_fold_sql(n_batches: int, cap: int = BUCKET_CAP) -> str:
    """Complete-query form of the shared greedy-fold generator (since
    round 8 it lives in streaming.dedup_lsh — ONE source of truth with
    the driver's multi-batch 'sneardup' oracle). Expects a preceding
    relation ``docs(doc_id, text, batch)``."""
    from sports_stats_data_pipeline_spark.streaming.dedup_lsh import (
        greedy_fold_cte_parts,
    )

    parts, store = greedy_fold_cte_parts(n_batches, cap)
    return "WITH " + ",\n".join(parts) + f"\nSELECT doc_id FROM {store}"


def test_multibatch_greedy_admission_matches_duckdb_fold(spark, tmp_path):
    """>= 3-batch run of the real stream vs the unrolled DuckDB fold.

    The corpus mixes sf0.001 documents (batched by doc_id % 3) with
    synthesized near-dups landing in DIFFERENT batches than their
    originals, plus a crafted greedy triple: A (batch 0, admitted),
    B = A + 2 words (batch 1, dropped against A), Y = A + 6 words
    (batch 2) with J(A,Y) = 8/14 < 0.6 but J(B,Y) = 10/14 >= 0.6 —
    admitted ONLY because greedy admission never indexes the dropped
    B. The fold must reproduce the exact admitted set, greedy quirk
    included."""
    import os
    import shutil

    import duckdb

    from sports_stats_data_pipeline_spark.sources.tables import load_table

    base = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter("doc_id < 60")
        .collect()
    ]
    dups = [
        (i + 1000000, t + " near dup tail marker")
        for i, t in base
        if i % 7 == 0
    ]
    tri_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    tri_b = tri_a + " kilo lima"
    tri_y = tri_a + " kilo lima mike november oscar papa"
    batches: list[list[tuple[int, str]]] = [[], [], []]
    for i, t in base + dups:
        batches[i % 3].append((i, t))
    batches[0].append((5000, tri_a))
    batches[1].append((5001, tri_b))
    batches[2].append((5002, tri_y))

    landing = tmp_path / "landing"
    landing.mkdir()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        dest = str(landing / f"batch{i}.parquet")
        shutil.copy(os.path.join(stage, part), dest)
        # the file source orders micro-batches by modification time —
        # pin it so batch i really arrives i-th
        os.utime(dest, (1_700_000_000 + 100 * i,) * 2)

    out = run_streaming_neardup_dedup(
        spark, str(landing), str(tmp_path / "store")
    )
    spark_ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())

    con = duckdb.connect()
    all_rows = [
        (i, t, b) for b, rows in enumerate(batches) for i, t in rows
    ]
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, batch INT)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", all_rows)
    duck_ids = sorted(
        r[0] for r in con.execute(_greedy_fold_sql(3)).fetchall()
    )
    assert len(spark_ids) > 0 and spark_ids == duck_ids
    # the greedy pin itself: B dropped against A, Y admitted because
    # the dropped B never joined the index
    assert 5000 in spark_ids and 5001 not in spark_ids
    assert 5002 in spark_ids


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
