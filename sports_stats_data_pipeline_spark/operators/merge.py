"""Incremental merge core: insert-if-absent and first-wins dedup.

The reference's central guarantee is resume-safe incremental ingestion
(scrapers/fighters_scraper.py:163-211, scrapers/fights_scraper.py:221-267):
``concat([existing, new]).drop_duplicates(subset=[key])`` with pandas'
default ``keep="first"`` — i.e. an existing row is never updated, only new
keys are appended (SURVEY.md §1.4, §2.4 A5, §2.3 J1).

Spark's ``dropDuplicates`` keeps an *arbitrary* row per key, so a naive
union+dropDuplicates does NOT reproduce first-wins. Two faithful forms:

- :func:`insert_if_absent` — ``new LEFT ANTI JOIN existing`` then
  ``unionByName``. One shuffle on the key (or none, if the existing key set
  broadcasts); the natural batch/foreachBatch formulation. At 100 TB the
  anti-join is a shuffled hash join on the key — same cost class as any
  keyed merge; with Delta available it becomes
  ``MERGE ... WHEN NOT MATCHED THEN INSERT``.
- :func:`first_wins_dedup` — ``row_number() OVER (PARTITION BY key ORDER BY
  priority) = 1`` when batches carry an explicit arrival/priority column.
  Use when several batches merge at once and arrival order must decide.

Union alignment is by NAME (``unionByName(allowMissingColumns=True)``):
pandas ``concat`` aligns on column names, Spark's positional ``union``
would silently mismatch (SURVEY.md §2.7 U1, risk register §7.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def insert_if_absent(
    existing: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Append rows of ``new`` whose key is absent from ``existing``.

    Existing rows win unconditionally (reference semantics: pandas
    ``drop_duplicates(keep="first")`` after ``concat([existing, new])``,
    fighters_scraper.py:190-191). Rows of ``new`` that duplicate each other
    are also collapsed (arbitrary winner, matching ``drop_duplicates``
    applied to the already-deduped existing side).
    """
    additions = new.dropDuplicates(list(keys)).join(
        existing.select(*keys), on=list(keys), how="left_anti"
    )
    return existing.unionByName(additions, allowMissingColumns=True)


def first_wins_dedup(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep the first row per key under an explicit ordering.

    Deterministic replacement for pandas ``drop_duplicates(keep="first")``
    when a batch carries its own arrival order (ingest timestamp, batch id,
    file sequence). One shuffle on ``keys``; at scale this is the standard
    windowed dedup and AQE handles skewed keys.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
