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
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: a file under half the target size counts as "small"; compaction is
#: recommended when more than this fraction (basis points) of a table's
#: files are small. Shared by the directory-walk and relation variants.
SMALL_FRACTION_GATE_BP = 2_500


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    *,
    zorder_cols: Sequence[str] | None = None,
    zorder_bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Rewrite a parquet directory into ``target_partitions`` files.

    ``zorder_cols`` pipelines the cluster-on-write into the SAME staged
    rewrite (Delta's ``OPTIMIZE ... ZORDER BY``): the small files are
    read once and land z-ordered — one pass instead of compact-then-
    re-read-then-re-write (round-10 fusion of the mart slot's two
    rewrites). Pass ``zorder_bounds`` when the caller already knows the
    per-column min/max (e.g. from the publish scan's observe metrics)
    to skip the bounds aggregate entirely. The crash contract is
    unchanged either way: staging dir first, live dir replaced only
    after a successful write.
    """
    df = spark.read.parquet(path)
    staging = path + ".compacting"
    if zorder_cols:
        from .zorder import write_zordered

        write_zordered(
            df,
            staging,
            zorder_cols,
            n_files=target_partitions,
            bounds=zorder_bounds,
        )
    else:
        # coalesce, not repartition: no shuffle — just fewer write tasks.
        df.coalesce(target_partitions).write.mode("overwrite").parquet(
            staging
        )
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


def small_file_report(
    path: str, *, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Compaction advisor: size stats for a parquet table's data files.

    The operational question behind every OPTIMIZE schedule is "has
    this table fragmented enough to bother?" — at 100 TB, compacting on
    a timer wastes IO rewriting healthy tables, while never compacting
    drowns the scheduler in file-open overhead (each file is at least
    one task and one footer read). Returns::

        {"n_files", "total_bytes", "p50_bytes", "max_bytes",
         "n_small", "small_fraction_bp", "recommend_compaction"}

    where ``n_small`` counts files under half the ``target_bytes``
    (Spark's maxPartitionBytes-shaped default, 128 MiB) and the
    recommendation fires when more than a quarter of files are small —
    thresholds are starting points, not laws; wire the report into the
    same batch cadence as operators/expectations and alert on drift.

    Driver-side os.walk, not a Spark job: file metadata for one table
    is KBs. On object stores, swap in the store's list API.
    """
    sizes = sorted(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    if not sizes:
        return {
            "n_files": 0,
            "total_bytes": 0,
            "p50_bytes": 0,
            "max_bytes": 0,
            "n_small": 0,
            "small_fraction_bp": 0,
            "recommend_compaction": False,
        }
    n = len(sizes)
    n_small = sum(1 for s in sizes if s < target_bytes // 2)
    frac_bp = (10_000 * n_small) // n
    return {
        "n_files": n,
        "total_bytes": sum(sizes),
        "p50_bytes": sizes[(n - 1) // 2],
        "max_bytes": sizes[-1],
        "n_small": n_small,
        "small_fraction_bp": frac_bp,
        "recommend_compaction": frac_bp > SMALL_FRACTION_GATE_BP and n > 1,
    }


def small_file_report_df(
    files: DataFrame,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    size_col: str = "bytes",
) -> DataFrame:
    """:func:`small_file_report`'s decision logic over a ``(file,
    bytes)`` RELATION instead of a local directory walk — the form the
    advisor takes at 100 TB, where the inventory is itself a table
    (S3 Inventory exports, Iceberg/Delta manifests, the snapshots
    module's file lists) rather than something the driver can os.walk.

    One row: ``n_files, total_bytes, p50_bytes, max_bytes, n_small,
    small_fraction_bp, recommend_compaction`` (all BIGINT; the
    recommendation as 0/1), bit-identical to the dict variant on the
    same sizes. ``p50_bytes`` is the lower median (``sizes[(n-1)//2]``)
    — rank-based, so it needs one sort of the INVENTORY (metadata
    scale: ~1 row per data file, KBs per million files), never of the
    data. Empty inventory -> empty relation (callers branch on it).
    """
    half = target_bytes // 2
    sizes = files.select(F.col(size_col).cast("long").alias("b"))
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("b").alias("total_bytes"),
        F.max("b").alias("max_bytes"),
        F.sum((F.col("b") < half).cast("long")).alias("n_small"),
    )
    ranked = sizes.select(
        "b",
        F.row_number().over(Window.orderBy("b")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    p50 = ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2)
    ).select(F.col("b").alias("p50_bytes"))
    # exact integer floor-division ((x - x%n)/n — the division is of an
    # exact multiple), matching the dict variant's `//` bit-for-bit;
    # floor(double division) drifts at ulp-adjacent quotients
    bp_num = F.lit(10_000) * F.col("n_small")
    frac_bp = (
        (bp_num - bp_num % F.col("n_files")) / F.col("n_files")
    ).cast("long")
    return (
        stats.crossJoin(F.broadcast(p50))
        .withColumn("small_fraction_bp", frac_bp)
        .withColumn(
            "recommend_compaction",
            (
                (F.col("small_fraction_bp") > SMALL_FRACTION_GATE_BP)
                & (F.col("n_files") > 1)
            ).cast("long"),
        )
        .select(
            "n_files",
            "total_bytes",
            "p50_bytes",
            "max_bytes",
            "n_small",
            "small_fraction_bp",
            "recommend_compaction",
        )
    )
