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
# small SF -> small mod keeps the sample non-trivial. MUST be coprime
# to 7000028 = 7 * 1000004 = 7 * 2^2 * 53^2 * 89 (round 9, an advisor
# catch plus a self-review catch): on the dominant original<->clone
# pairs (doc_b = doc_a + 1000000) the predicate collapses to
# (1000004*a + 1000000) % mod, so a power-of-two mod passes 25-100% of
# clone pairs instead of 1/mod — the previous pin (MOD=4) mostly
# compared the UNSAMPLED clone set — while a mod divisible by 7
# samples ZERO of them (clone anchors sit at doc_a % 7 = 0, making the
# residue constantly 1000000 % 7 = 1).
MOD = 3

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
    # and achieve ~1/MOD on the structurally-dominant clone pairs
    # (doc_b = doc_a + 1000000), where a bad modulus degenerates: with
    # gcd(MOD, 7000028) = 1 the clone rate is the residue-class share
    # of doc_a, ~1/MOD — assert it stayed below 2/MOD so an
    # oversampling collapse (mod=4 passed 100%) can never sneak back
    # in, and above 0 so a zero-sample collapse (mod=7) can't either
    clones_full = full[full.doc_b == full.doc_a + 1000000]
    clones_sampled = sampled[sampled.doc_b == sampled.doc_a + 1000000]
    assert len(clones_full) > 0
    assert 0 < len(clones_sampled) <= 2 * len(clones_full) / MOD, (
        f"clone-pair sample rate {len(clones_sampled)}/{len(clones_full)}"
        f" is degenerate for mod {MOD}"
    )
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


def test_labels_mode_doc_clusters_oracle_matches_full(spark, oracle):
    """doc_clusters oracle fed engine pairs AND Python union-find
    labels (the round-9 walk-CTE relief — the walk's O(component^2)
    working set killed the 100x referee on disk) == the full
    self-computed oracle == the engine's own output."""
    import pandas as pd

    from sports_stats_data_pipeline_spark.plans.documents import (
        _minhash_verified_pairs,
        _neardup_docs,
    )
    from sports_stats_data_pipeline_spark.plans.graph_reference import (
        union_find_labels,
    )

    docs = _neardup_docs(spark, SF_DIR)
    pairs_pdf = _minhash_verified_pairs(docs).toPandas()
    assert len(pairs_pdf) > 0
    ids = docs.select("doc_id").toPandas()["doc_id"].tolist()
    py_lab = pd.DataFrame(
        union_find_labels(
            ids,
            zip(pairs_pdf["doc_a"].tolist(), pairs_pdf["doc_b"].tolist()),
        ),
        columns=["doc_id", "cluster_id"],
    )
    oracle.register("spark_pairs", pairs_pdf)
    oracle.register("py_lab", py_lab)
    try:
        spliced = oracle.execute(
            doc_clusters_oracle_sql("spark_pairs", labels_source="py_lab")
        ).df()
        full = oracle.execute(REG.oracles["neardup_doc_clusters"]).df()
        assert_frames_match(spliced, full, "labels-mode-vs-full-oracle")
        spark_pdf = REG.queries["neardup_doc_clusters"](
            spark, SF_DIR
        ).toPandas()
        assert_frames_match(spark_pdf, spliced, "spark-vs-labels-mode")
    finally:
        oracle.unregister("spark_pairs")
        oracle.unregister("py_lab")


@pytest.mark.parametrize("bad", [2, 4, 7, 16, 21, 53, 89, 106])
def test_non_coprime_sample_mod_rejected(bad):
    """Moduli sharing a factor with 7000028 degenerate on clone pairs
    (numerically verified: mod 4 passes 100% of them, mod 7 passes
    ZERO because clone anchors sit at doc_id % 7 = 0) — the builder
    must refuse them outright."""
    with pytest.raises(ValueError, match="coprime"):
        minhash_pairs_oracle_sql(bad)
