"""operators.observe — single-pass validated publish: metrics ride the
write job, gates decide promotion, failures leave the live sink
untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.observe import (
    PublishGateError,
    write_validated,
)

def METRICS():
    # built lazily: column expressions need an active SparkContext
    return {
        "n": F.count(F.lit(1)),
        "null_ids": F.sum(F.col("id").isNull().cast("long")),
        "max_v": F.max("v"),
    }


def _src(spark, tmp_path, n=100):
    p = str(tmp_path / "src")
    spark.range(n).select(
        "id", (F.col("id") * 3 % 17).alias("v")
    ).write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_pass_promotes_and_returns_metrics(spark, tmp_path):
    sink = str(tmp_path / "sink")
    got = write_validated(
        _src(spark, tmp_path),
        sink,
        METRICS(),
        {
            "nonempty": lambda m: m["n"] > 0,
            "no_null_ids": lambda m: m["null_ids"] == 0,
        },
    )
    assert got["n"] == 100 and got["null_ids"] == 0 and got["max_v"] == 16
    assert spark.read.parquet(sink).count() == 100


def test_fail_keeps_live_sink_and_names_gates(spark, tmp_path):
    sink = str(tmp_path / "sink")
    src = _src(spark, tmp_path)
    write_validated(src, sink, METRICS(), {"nonempty": lambda m: m["n"] > 0})
    # second publish: a poisoned batch must NOT replace the live data
    bad = src.withColumn(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
    )
    with pytest.raises(PublishGateError) as ei:
        write_validated(
            bad,
            sink,
            METRICS(),
            {
                "nonempty": lambda m: m["n"] > 0,
                "no_null_ids": lambda m: m["null_ids"] == 0,
            },
        )
    assert ei.value.failed == ["no_null_ids"]
    assert ei.value.metrics["null_ids"] == 10
    # live sink untouched; rejected batch parked in .staging
    live = spark.read.parquet(sink)
    assert live.count() == 100 and live.filter(F.col("id").isNull()).count() == 0
    assert spark.read.parquet(sink + ".staging").count() == 100


def test_single_scan_metrics_ride_the_write(spark, tmp_path):
    """The validation must not add a second scan: the written plan
    carries a CollectMetrics node over the ONE source scan."""
    src = _src(spark, tmp_path)
    from pyspark.sql import Observation

    obs = Observation()
    observed = src.observe(
        obs, *[c.alias(n) for n, c in METRICS().items()]
    )
    from sports_stats_data_pipeline_spark.plans.lint import (
        plan_text,
        scan_count,
    )

    assert "CollectMetrics" in plan_text(observed)
    assert scan_count(observed) == 1


def test_empty_input_gated_not_special_cased(spark, tmp_path):
    sink = str(tmp_path / "sink")
    empty = _src(spark, tmp_path).filter(F.col("id") < 0)
    with pytest.raises(PublishGateError) as ei:
        write_validated(
            empty, sink, METRICS(), {"nonempty": lambda m: m["n"] > 0}
        )
    assert ei.value.metrics["n"] == 0
    import os

    assert not os.path.exists(sink)  # nothing was ever promoted
