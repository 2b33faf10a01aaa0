"""Benchmark decontamination: flag training documents whose token
n-grams overlap an evaluation/benchmark set — the curation step that
keeps test data out of a training corpus (the contamination check run
before any serious pretraining job).

Shape: the BENCHMARK side is small (eval suites are thousands of
documents, not billions) — its exploded shingle inverted index is
broadcast, so the corpus is never shuffled: one scan, explode to
(doc_id, shingle), hash-join against the broadcast index, one aggregate
back to per-document overlap stats. At 100 TB the corpus-side explode is
the only big intermediate and it streams through the join; nothing is
quadratic and nothing shuffles except the final per-doc aggregate
(map-side combinable).

Common-shingle noise: an eval question sharing "it is important to note"
with half the corpus is not contamination. The index drops shingles
whose BENCHMARK document frequency exceeds ``max_bench_df`` (the
benchmark is small, so its own df is computable exactly and cheaply).
Optionally ``max_corpus_df`` additionally drops shingles frequent in
the CORPUS — the precision upgrade for boilerplate the benchmark
happens to quote once. It costs one extra corpus scan + one aggregate
bounded by the shingle vocabulary (map-side combinable, then
semi-joined against the already-small benchmark index — the corpus df
table is only materialized for shingles the index contains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold_pct: int = 50,
    max_bench_df: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    max_corpus_df: int | None = None,
) -> DataFrame:
    """Per-document overlap against the benchmark shingle index.

    Returns one row per corpus document: ``(id_col, n_shingles,
    n_overlap, overlap_pct, contaminated)`` where ``overlap_pct`` is the
    integer percentage of the document's distinct shingles that appear
    anywhere in the benchmark, and ``contaminated`` is 1 when
    ``overlap_pct >= threshold_pct`` (integer arithmetic throughout —
    no float threshold can flip across engines).

    ``max_corpus_df``, when set, also drops index shingles appearing in
    more than that many CORPUS documents (boilerplate guard — see the
    module docstring for the cost trade).
    """
    bench_index = (
        benchmark.select(
            F.explode(shingles(text_col)).alias("shingle"),
            F.col(bench_id_col).alias("__bid"),
        )
        .groupBy("shingle")
        .agg(F.count_distinct("__bid").alias("__df"))
        .filter(F.col("__df") <= max_bench_df)
        .select("shingle", F.lit(1).alias("__hit"))
    )
    if max_corpus_df is not None:
        # second scan, restricted immediately to index shingles so the
        # df aggregate's input is index-hit-sized, not corpus-vocabulary
        # sized; the over-cap list anti-joins the (small) index.
        # localCheckpoint, not persist: the index is tiny, both branches
        # reuse the materialized blocks, and the blocks are GC-scoped —
        # repeated calls don't accumulate CacheManager entries (an index
        # this small re-builds in seconds if an executor drops it).
        bench_index = bench_index.localCheckpoint(eager=True)
        hot = (
            docs.select(
                F.col(id_col).alias("__cid"),
                F.explode(shingles(text_col)).alias("shingle"),
            )
            .join(F.broadcast(bench_index.select("shingle")), "shingle")
            .groupBy("shingle")
            .agg(F.count_distinct("__cid").alias("__cdf"))
            .filter(F.col("__cdf") > max_corpus_df)
            .select("shingle")
        )
        bench_index = bench_index.join(hot, "shingle", "left_anti")
    # ONE corpus pass: explode, left-join the broadcast index per
    # shingle, aggregate straight back to one row per doc — no second
    # scan, no doc-level join, the only shuffle is the (map-side
    # combinable) per-doc aggregate. n_shingles falls out of the same
    # aggregate as count(*): the shingle set is distinct, so the explode
    # emits exactly n_shingles rows per doc. NEVER put the array-size
    # expression in the select NEXT TO the explode — a non-attribute
    # projection sibling of a Generate is re-evaluated per exploded row,
    # which made this scan O(doc_len²) per document (observed: 546 s vs
    # 8 s on the 5000-doc corpus).
    exploded = docs.select(
        F.col(id_col),
        F.explode(shingles(text_col)).alias("shingle"),
    )
    out = (
        exploded.join(F.broadcast(bench_index), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_overlap"),
        )
        .withColumn(
            "overlap_pct",
            F.floor(F.lit(100) * F.col("n_overlap") / F.col("n_shingles"))
            .cast("long"),
        )
        .withColumn(
            "contaminated",
            (F.col("overlap_pct") >= threshold_pct).cast("int"),
        )
    )
    return out
