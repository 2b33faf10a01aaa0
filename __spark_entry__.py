"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q3-shaped: filter → 3-way
join → agg → top-k) on sf0.001. ``queries()`` exposes every implemented
operator from SURVEY.md §2 (plus the LLM-pipeline extensions);
``oracle_sql()`` gives each one's DuckDB twin. Registries live in
``sports_stats_data_pipeline_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sports_stats_data_pipeline_spark.plans import all_registries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sports_stats_data_pipeline_spark.plans.relational import (
        q3_shipping_priority,
    )

    return q3_shipping_priority(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(all_registries().queries)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted only for
    non-SQL-expressible ops, which get a rows-only check)."""
    return dict(all_registries().oracles)
