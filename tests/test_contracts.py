"""plans.contracts: the named-assert layer over driver-corpus
assumptions (round 6 — the NOTES watch list made loud)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.plans.contracts import (
    TestdataContractViolation,
    require,
)


def test_require_passes_silently(spark):
    df = spark.range(10)
    require(df, F.max("id") < 100, "bounded_ids", "ids must stay small")


def test_require_raises_named_with_metrics(spark):
    df = spark.range(10)
    with pytest.raises(TestdataContractViolation) as ei:
        require(
            df,
            F.max("id") < 5,
            "bounded_ids",
            "ids must stay small",
            F.max("id").alias("max_id"),
        )
    msg = str(ei.value)
    assert "bounded_ids" in msg and "max_id" in msg and "9" in msg


def test_semdedup_contract_fires_on_unnormalized_vectors(spark, monkeypatch):
    """If embeddings stop being unit-norm, neardup_doc_clusters must
    fail with the NAMED contract, not an opaque oracle hash flip."""
    from sports_stats_data_pipeline_spark.plans import documents as docmod
    from sports_stats_data_pipeline_spark.sources import tables as tmod

    real_load = tmod.load_table

    def scaled_load(spark_, sf_dir_, name):
        df = real_load(spark_, sf_dir_, name)
        if name == "embeddings":
            return df.withColumn(
                "embedding",
                F.transform("embedding", lambda x: x * F.lit(2.0)),
            )
        return df

    monkeypatch.setattr(docmod, "load_table", scaled_load)
    with pytest.raises(TestdataContractViolation) as ei:
        docmod.neardup_doc_clusters(
            spark, "/root/testdata/sf0.001"
        ).collect()
    assert "semdedup_unit_norm_embeddings" in str(ei.value)
