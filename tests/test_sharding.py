"""operators.sharding — distributed prefix-sum shard packing must equal
the naive global-window formulation (DuckDB twin), stay deterministic,
and respect the budget envelope."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.sharding import (
    assign_token_shards,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
BUDGET = 2000


def _spark_shards(spark, n_buckets=7):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    out = assign_token_shards(
        docs, BUDGET, token_col="n_tokens", n_buckets=n_buckets
    )
    return {
        r["doc_id"]: (r["start_offset"], r["shard"]) for r in out.collect()
    }


def test_matches_duckdb_global_cumsum(spark):
    got = _spark_shards(spark)
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT doc_id,
                   CAST(COALESCE(SUM(len(string_split_regex(text, '\\s+')))
                        OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
                   CAST(COALESCE(SUM(len(string_split_regex(text, '\\s+')))
                        OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) // {BUDGET} AS BIGINT)
                     AS shard
            FROM read_parquet('{SF}/documents.parquet')
            """
        ).fetchall()
    }
    assert got == want


def test_bucket_count_does_not_change_layout(spark):
    # the parallelism knob must be invisible in the output
    assert _spark_shards(spark, n_buckets=3) == _spark_shards(
        spark, n_buckets=64
    )


def test_budget_envelope_and_contiguity(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["shard"])
        for r in assign_token_shards(docs, BUDGET).collect()
    )
    shards = [s for _, _, s in rows]
    assert shards == sorted(shards), "shard ids must be monotone in doc_id"
    max_doc = max(n for _, n, _ in rows)
    totals: dict[int, int] = {}
    for _, n, s in rows:
        totals[s] = totals.get(s, 0) + n
    # every shard's total stays within budget + one document (a doc
    # starting before the boundary finishes its shard past it); every
    # shard but the last is filled to at least the budget minus one doc.
    last = max(totals)
    for s, tot in totals.items():
        assert tot <= BUDGET + max_doc, (s, tot)
        if s != last:
            assert tot >= BUDGET - max_doc, (s, tot)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert assign_token_shards(empty, 100).count() == 0


def test_bad_budget(spark):
    docs = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        assign_token_shards(docs, 0)


# ---------------------------------------------------------------------------
# pack_training_sequences: GPT-style concat-and-cut segment map.
# ---------------------------------------------------------------------------
SEQ_LEN = 512


def _packed(spark):
    from sports_stats_data_pipeline_spark.operators.sharding import (
        pack_training_sequences,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    return pack_training_sequences(
        docs, SEQ_LEN, token_col="n_tokens", n_buckets=7
    )


def test_pack_matches_duckdb_segment_map(spark):
    """Segment map equals the naive global-cumsum formulation computed
    in DuckDB (generate_series over each doc's touched sequences)."""
    con = duckdb.connect()
    oc = con.execute(f"""
        WITH docs AS (
          SELECT doc_id,
                 len(string_split_regex(text, '\\s+')) AS n_tokens
          FROM read_parquet('{SF}/documents.parquet')
        ), laid AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_offset
          FROM docs
        )
        SELECT doc_id, start_offset, s.seq_id,
               GREATEST(0, s.seq_id * {SEQ_LEN} - start_offset) AS doc_from,
               LEAST(n_tokens, (s.seq_id + 1) * {SEQ_LEN} - start_offset)
                 AS doc_to,
               GREATEST(0, start_offset - s.seq_id * {SEQ_LEN}) AS seq_from
        FROM laid,
             LATERAL (SELECT unnest(generate_series(
                 CAST(start_offset // {SEQ_LEN} AS BIGINT),
                 CAST((start_offset + n_tokens - 1) // {SEQ_LEN} AS BIGINT)))
                 AS seq_id) s
        WHERE n_tokens > 0
    """).fetchall()
    sp = {
        (r["doc_id"], r["seq_id"]): (
            r["start_offset"], r["doc_from"], r["doc_to"], r["seq_from"]
        )
        for r in _packed(spark).collect()
    }
    oc_map = {(r[0], r[2]): (r[1], r[3], r[4], r[5]) for r in oc}
    assert sp == oc_map and len(sp) > 0


def test_pack_sequences_tile_exactly(spark):
    """Every sequence except the last is filled to exactly SEQ_LEN with
    non-overlapping contiguous segments; every document's segments tile
    its full token range in order."""
    rows = _packed(spark).collect()
    by_seq, by_doc = {}, {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(
            (r["seq_from"], r["seq_from"] + (r["doc_to"] - r["doc_from"]))
        )
        by_doc.setdefault(r["doc_id"], []).append(
            (r["seq_id"], r["doc_from"], r["doc_to"])
        )
    last_seq = max(by_seq)
    for seq, segs in by_seq.items():
        segs.sort()
        assert segs[0][0] == 0
        for (a0, a1), (b0, b1) in zip(segs, segs[1:]):
            assert a1 == b0, (seq, segs)
        if seq != last_seq:
            assert segs[-1][1] == SEQ_LEN, (seq, segs)
    for doc, segs in by_doc.items():
        segs.sort()
        assert segs[0][1] == 0
        for (_, _, a1), (_, b0, _) in zip(segs, segs[1:]):
            assert a1 == b0, (doc, segs)


def test_pack_append_stability(spark):
    """Packing a prefix of the corpus then appending the rest never
    changes existing (doc, seq) segments — the restart-stable layout."""
    from sports_stats_data_pipeline_spark.operators.sharding import (
        pack_training_sequences,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    full = {
        (r["doc_id"], r["seq_id"]): (r["doc_from"], r["doc_to"], r["seq_from"])
        for r in pack_training_sequences(docs, SEQ_LEN, token_col="n_tokens").collect()
    }
    prefix = {
        (r["doc_id"], r["seq_id"]): (r["doc_from"], r["doc_to"], r["seq_from"])
        for r in pack_training_sequences(
            docs.filter(F.col("doc_id") < 100), SEQ_LEN, token_col="n_tokens"
        ).collect()
    }
    assert prefix == {k: v for k, v in full.items() if k[0] < 100}


def test_pack_bad_seq_len(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    from sports_stats_data_pipeline_spark.operators.sharding import (
        pack_training_sequences,
    )

    with pytest.raises(ValueError):
        pack_training_sequences(docs, 0)


# ---------------------------------------------------------------------------
# epoch_shuffle: deterministic seeded permutation without a global sort
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_a_permutation(spark):
    from sports_stats_data_pipeline_spark.operators.sharding import (
        epoch_shuffle,
    )

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(docs, epoch=0, n_buckets=8)
    pos = sorted(r["epoch_pos"] for r in out.collect())
    assert pos == list(range(500))


def test_epoch_shuffle_matches_global_sort_and_is_stable(spark):
    """The two-level form must equal the naive global-ORDER BY rank, and
    re-running the same epoch must reproduce it exactly."""
    from pyspark.sql import Window

    from sports_stats_data_pipeline_spark.operators.sharding import (
        epoch_shuffle,
    )

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=3, n_buckets=16).collect()
    }
    again = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=3, n_buckets=16).collect()
    }
    assert out == again
    # naive reference: rank over the raw unsigned hash order
    naive = docs.select(
        "doc_id",
        F.xxhash64(F.lit(3), F.col("doc_id")).alias("h"),
    ).select(
        "doc_id",
        (
            F.row_number().over(
                Window.orderBy(
                    F.shiftrightunsigned(F.col("h"), 1),
                    F.pmod(F.col("h"), F.lit(2)),
                    "doc_id",
                )
            )
            - 1
        ).alias("pos"),
    )
    ref = {r["doc_id"]: r["pos"] for r in naive.collect()}
    assert out == ref


def test_epoch_shuffle_epochs_differ(spark):
    from sports_stats_data_pipeline_spark.operators.sharding import (
        epoch_shuffle,
    )

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    e0 = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=0).collect()
    }
    e1 = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(docs, epoch=1).collect()
    }
    assert e0 != e1


def test_epoch_shuffle_rejects_non_power_of_two(spark):
    from sports_stats_data_pipeline_spark.operators.sharding import (
        epoch_shuffle,
    )

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="power of two"):
        epoch_shuffle(docs, epoch=0, n_buckets=12)


def test_epoch_shuffle_md5_mode_matches_duckdb_twin(spark):
    """The md5 hash mode is cross-engine: DuckDB ranking the same
    md5-derived keys produces the identical permutation."""
    import duckdb

    from sports_stats_data_pipeline_spark.operators.sharding import (
        epoch_shuffle,
        md5_epoch_hash,
    )

    docs = spark.range(400).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["epoch_pos"]
        for r in epoch_shuffle(
            docs, epoch=7, n_buckets=16, hash_fn=md5_epoch_hash
        ).collect()
    }
    ref = dict(
        duckdb.connect()
        .execute(
            """
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                     ORDER BY ('0x' || substr(md5(7 || ':' || doc_id), 1, 15))::BIGINT,
                              doc_id
                   ) - 1 AS pos
            FROM range(400) t(doc_id)
            """
        )
        .fetchall()
    )
    assert got == ref
