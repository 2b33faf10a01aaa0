"""Pins for the >=60x scale-validation oracle modes (round 8).

At 30x replica scale the binding wall was the single-threaded DuckDB
referee on the clone-dense dedup families, not the engine (73m43s,
NOTES.md round 7). Two relief modes keep the referee wall bounded by
the engine under test at >=60x, both pinned here at small SF against
the full oracles they replace:

- CANDIDATE-SAMPLED minhash: the oracle keeps only candidate pairs
  with (doc_a*1000003 + doc_b) % mod = 0 BEFORE the exact-Jaccard
  verify join (the quadratic referee cost); the engine runs the full
  workload and only its OUTPUT is filtered by the same predicate for
  comparison. Sampling before verify is sound because the predicate
  depends only on the pair key, never on the verify outcome.
- ENGINE-PAIRS doc_clusters: the referee consumes the engine's
  verified pair table (itself gated by the sampled minhash family) and
  independently recomputes the graph legs — components fixpoint,
  PageRank rounds, triangles, SemDeDup — skipping the shingling +
  verify chain entirely.
"""

from __future__ import annotations

import duckdb
import pytest

from sports_stats_data_pipeline_spark.plans import all_registries
from sports_stats_data_pipeline_spark.plans.documents import (
    doc_clusters_oracle_sql,
    minhash_pairs_oracle_sql,
)
from sports_stats_data_pipeline_spark.sources.tables import TABLE_NAMES

from ._compare import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"
MOD = 4  # small SF -> small mod keeps the sample non-trivial

REG = all_registries()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        yield con
    finally:
        con.close()


def test_builders_reproduce_registered_oracles():
    assert REG.oracles["neardup_minhash_pairs"] == minhash_pairs_oracle_sql()
    assert REG.oracles["neardup_doc_clusters"] == doc_clusters_oracle_sql()


def test_sampled_minhash_oracle_matches_filtered_full(spark, oracle):
    """sampled oracle == full oracle filtered by the same predicate
    (DuckDB vs DuckDB: the sampling commutes past the verify), and the
    engine's FULL run filtered by the predicate matches the sampled
    oracle (the actual >=60x comparison)."""
    full = oracle.execute(
        REG.oracles["neardup_minhash_pairs"]
    ).df()
    sampled = oracle.execute(minhash_pairs_oracle_sql(MOD)).df()
    full_filtered = full[
        (full.doc_a * 1000003 + full.doc_b) % MOD == 0
    ].reset_index(drop=True)
    # the sample must be non-trivial in both directions
    assert 0 < len(sampled) < len(full)
    assert_frames_match(full_filtered, sampled, "sampled-vs-filtered-full")

    spark_full = REG.queries["neardup_minhash_pairs"](
        spark, SF_DIR
    ).toPandas()
    spark_filtered = spark_full[
        (spark_full.doc_a * 1000003 + spark_full.doc_b) % MOD == 0
    ].reset_index(drop=True)
    assert_frames_match(spark_filtered, sampled, "spark-vs-sampled-oracle")


def test_engine_pairs_doc_clusters_oracle_matches_full(spark, oracle):
    """doc_clusters oracle fed the ENGINE's verified pair table ==
    the full self-computed oracle == the engine's own output."""
    from sports_stats_data_pipeline_spark.plans.documents import (
        _minhash_verified_pairs,
        _neardup_docs,
    )

    pairs_pdf = _minhash_verified_pairs(
        _neardup_docs(spark, SF_DIR)
    ).toPandas()
    assert len(pairs_pdf) > 0
    oracle.register("spark_pairs", pairs_pdf)
    try:
        spliced = oracle.execute(
            doc_clusters_oracle_sql("spark_pairs")
        ).df()
        full = oracle.execute(REG.oracles["neardup_doc_clusters"]).df()
        assert_frames_match(spliced, full, "engine-pairs-vs-full-oracle")
        spark_pdf = REG.queries["neardup_doc_clusters"](
            spark, SF_DIR
        ).toPandas()
        assert_frames_match(spark_pdf, spliced, "spark-vs-engine-pairs")
    finally:
        oracle.unregister("spark_pairs")
