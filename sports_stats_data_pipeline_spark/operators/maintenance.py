"""Table-maintenance operators: small-file compaction.

A long-running incremental pipeline (foreachBatch appends, streaming
sinks) accretes many small files; scan cost and memory pressure grow
with file count, not bytes. Compaction rewrites a table to
``target_partitions`` right-sized files. Parquet has no transactional
rewrite (Delta's OPTIMIZE does this natively at production scale), so
the write goes to a staging directory and replaces the original only
after success — crash-safe: a failed compaction leaves the original
untouched.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession, path: str, target_partitions: int
) -> DataFrame:
    """Rewrite a parquet directory into ``target_partitions`` files."""
    df = spark.read.parquet(path)
    staging = path + ".compacting"
    # coalesce, not repartition: no shuffle — just fewer write tasks.
    df.coalesce(target_partitions).write.mode("overwrite").parquet(staging)
    old = path + ".old"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return spark.read.parquet(path)


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
