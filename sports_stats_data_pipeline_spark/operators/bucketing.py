"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4 /
100 TB design).

A fact⋈fact equi-join (e.g. lineitem⋈orders on orderkey) normally
shuffles both sides every query. Bucketing pays that shuffle once at
write time: both tables hash-partitioned into the same number of buckets
on the join key, so every subsequent join is a per-bucket sort-merge with
**no Exchange** in the plan (verified in tests/test_bucketing.py). This
is the single biggest repeated-query win at cluster scale, and the
engine-native replacement for the reference's single-process "everything
is already local" assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize a bucketed (and optionally sorted) managed table.

    Drops any previous table AND its orphaned location first — a crashed
    writer can leave the directory behind after the catalog entry is
    gone, and saveAsTable then refuses the name.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans without
    a shuffle when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
