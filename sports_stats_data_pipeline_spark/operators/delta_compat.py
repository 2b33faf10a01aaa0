"""Delta Lake compat shims: the transactional MERGE / OPTIMIZE surface
behind an import-try, with the repo's parquet stand-ins as the fallback.

SURVEY.md maps the reference's S5 sink-overwrite, A5 keyed dedup-merge
and I5 periodic checkpointing onto Delta ``MERGE``/``OPTIMIZE`` where
the environment provides Delta. This container ships no ``delta-spark``
package, so the repo implements the same semantics on plain parquet
(operators.merge + operators.sinks staged-replace, operators.maintenance
compaction) — this module makes the Delta mapping EXECUTABLE instead of
documentation-only: when ``delta-spark`` is importable (and the session
carries the Delta extension), the same calls route to the transactional
paths; otherwise they fall back to the crash-safe parquet protocol.

Semantics contract (identical either way):
- :func:`upsert` — last-writer-wins per key: matched target rows are
  replaced by the update row, unmatched update rows are inserted
  (Delta: ``whenMatchedUpdateAll + whenNotMatchedInsertAll``).
- :func:`insert_absent` — first-writer-wins per key: existing rows are
  untouched, only absent keys are inserted (the reference's merge rule;
  Delta: ``whenNotMatchedInsertAll`` alone).
- :func:`optimize` — rewrite a table into ~``target_files`` files
  (Delta: ``OPTIMIZE``; parquet: maintenance.compact_parquet through
  the staged-replace rename protocol).

At 100 TB the Delta paths additionally give snapshot isolation and
file-level conflict detection; the parquet fallback gives crash
recoverability only (sinks.py module docstring) — callers needing
concurrent writers must use the Delta route.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from functools import reduce

from pyspark.sql import functions as F

from .maintenance import compact_parquet
from .sinks import promote_staging


def delta_available(spark: SparkSession) -> bool:
    """True when delta-spark is importable AND the session was built
    with the Delta SQL extension + catalog (both are required; the
    package alone cannot retrofit a running session)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


def _merge_condition(keys: Sequence[str]) -> str:
    return " AND ".join(f"t.{k} <=> s.{k}" for k in keys)


def _anti_join_null_safe(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """``left LEFT ANTI JOIN right`` matching keys null-safely (``<=>``),
    mirroring the Delta MERGE condition above — a plain-equality anti
    join never matches NULL keys, so the parquet fallback would
    duplicate/re-insert NULL-keyed rows that Delta replaces/skips.
    Null-safe equality is still an equi-join key for Spark's hash join.
    """
    renamed = right.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys]
    ).dropDuplicates()
    # qualify through the DataFrame references, not bare F.col names —
    # a left table that itself carries a __s_<key> column would make
    # the bare name ambiguous at analysis time
    cond = reduce(
        lambda a, b: a & b,
        [left[k].eqNullSafe(renamed[f"__s_{k}"]) for k in keys],
    )
    return left.join(renamed, cond, "left_anti")


def upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> None:
    """Last-writer-wins MERGE of ``updates`` into the table at ``path``
    (creating it if absent). ``order_col`` deterministically picks the
    winner among duplicate keys WITHIN ``updates`` (max order wins;
    ``(keys, order_col)`` must be unique per batch — equal order
    values fall back to partition-scan order); required when updates
    may carry intra-batch duplicates — Delta's MERGE rejects multiple
    source matches per target row.
    """
    ks = list(keys)
    if order_col is not None:
        # last-writer-wins inside the batch: keep the max order_col row
        # per key (first_wins_dedup under the inverted ordering).
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*ks).orderBy(F.col(order_col).desc())
        latest = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        latest = updates.dropDuplicates(ks)

    if delta_available(spark):
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, path):
            latest.write.format("delta").mode("overwrite").save(path)
            return
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(latest.alias("s"), _merge_condition(ks))
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    if not os.path.exists(path):
        latest.write.mode("overwrite").parquet(path + ".staging")
        promote_staging(path)
        return
    existing = spark.read.parquet(path)
    kept = _anti_join_null_safe(existing, latest.select(*ks), ks)
    merged = kept.unionByName(latest, allowMissingColumns=True)
    merged.write.mode("overwrite").parquet(path + ".staging")
    promote_staging(path)


def insert_absent(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> None:
    """First-writer-wins MERGE: insert only keys absent from the table
    at ``path`` (the reference's incremental-skip rule, J1/A5).

    ``order_col`` deterministically picks the surviving row among
    duplicate keys WITHIN ``new`` (min order wins — first-writer-wins
    extended into the batch). Determinism requires ``(keys,
    order_col)`` to be unique within the batch (a sequence number or
    ingest timestamp with uniqueness): EQUAL order values fall back to
    partition-scan order, the very nondeterminism the parameter
    exists to remove. Without ``order_col``, intra-batch duplicate
    keys with differing payloads are resolved arbitrarily
    (``dropDuplicates`` keeps whichever row a partition scan sees
    first); pass it whenever batches can carry such rows.
    """
    ks = list(keys)
    if order_col is not None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy(*ks).orderBy(F.col(order_col).asc())
        new = (
            new.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if delta_available(spark):
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, path):
            new.dropDuplicates(ks).write.format("delta").mode(
                "overwrite"
            ).save(path)
            return
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(new.dropDuplicates(ks).alias("s"), _merge_condition(ks))
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    if not os.path.exists(path):
        new.dropDuplicates(ks).write.mode("overwrite").parquet(path + ".staging")
        promote_staging(path)
        return
    existing = spark.read.parquet(path)
    # first-writer-wins with the same null-safe key matching as the
    # Delta MERGE condition (merge.insert_if_absent is plain-equality
    # by documented reference semantics, so it is not reused here)
    additions = _anti_join_null_safe(
        new.dropDuplicates(ks), existing.select(*ks), ks
    )
    merged = existing.unionByName(additions, allowMissingColumns=True)
    merged.write.mode("overwrite").parquet(path + ".staging")
    promote_staging(path)


def optimize(
    spark: SparkSession, path: str, target_files: int = 8
) -> None:
    """Compact the table at ``path`` into ~``target_files`` files."""
    if delta_available(spark):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return
    compact_parquet(spark, path, target_partitions=target_files)
