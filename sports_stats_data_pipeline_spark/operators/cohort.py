"""Cohort retention analysis — the activation/retention matrix over an
event stream.

Users are cohorted by the period of their FIRST activity; each later
period they appear in increments that cohort's retention at the
corresponding offset. The output is the classic retention triangle:
``(cohort, period_offset) -> active users, retention basis points``.

Scale shape (three bounded steps, no skew trap):
1. per-user first activity — one groupBy(user) over the events scan
   (map-side combinable min);
2. events ⋈ user-cohort — co-keyed hash join on user (the first agg's
   partitioning serves it), then distinct (cohort, offset, user): the
   shuffle is bounded by distinct user-periods, not events;
3. matrix aggregate — groupBy (cohort, offset), tiny output
   (periods²/2 rows).

Retention is integer basis points (``10000 * active // cohort_size``)
so the driver oracle hash-matches across engines; cohort periods use
``date_trunc`` (Monday-start weeks in both Spark and DuckDB) and
offsets divide exact day differences by the period length — no
float date math anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"week": 7, "day": 1}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix ``(cohort, period_offset, active_users,
    cohort_size, retention_bp)``; ``cohort`` is the ISO date of the
    period start. Offset 0 is the activation period itself
    (retention_bp == 10000 by construction)."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]
    bucket = F.date_trunc("week" if period == "week" else "day", F.col(ts_col))
    # rows without a user or timestamp cannot be cohorted — dropped up
    # front (a NULL ts would otherwise surface as a NULL period_offset
    # row, which engines then concatenate/propagate differently)
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("user"), bucket.alias("p"))
    # first activity as a WINDOW over the user partition, not
    # groupBy+join-back (round 13): min(p) over the user partition is
    # the same per-user minimum, and attaching it where the rows
    # already live removes one full events scan, the first-activity
    # shuffle AND the user-keyed self-join — ONE exchange on user
    # serves cohorting (the distinct below reuses nothing bigger than
    # distinct user-periods, as before).
    from pyspark.sql import Window

    cohorted = ev.withColumn(
        "cohort_p", F.min("p").over(Window.partitionBy("user"))
    )
    # the distinct's input is user-partitioned (the window above), and
    # user is a subset of the distinct key, so no second exchange; the
    # groupBy's shuffle is bounded by distinct user-periods, as before
    active = (
        cohorted.select(
            "cohort_p",
            (
                F.datediff(F.col("p"), F.col("cohort_p")) / days
            ).cast("long").alias("period_offset"),
            "user",
        )
        .distinct()
        .groupBy("cohort_p", "period_offset")
        .agg(F.count("*").alias("active_users"))
    )
    # cohort_size via a window over the matrix itself (round 13): every
    # user is active at offset 0 by construction (the activation period
    # IS their first activity), so active_users(cohort, 0) equals the
    # count of users whose first period is that cohort — the former
    # separate distinct-users + groupBy + join-back leg computed the
    # same number from the same rows. The window's exchange is over the
    # periods²/2-row matrix, not data.
    size_w = Window.partitionBy("cohort_p")
    return active.select(
        F.date_format("cohort_p", "yyyy-MM-dd").alias("cohort"),
        "period_offset",
        "active_users",
        F.max(
            F.when(F.col("period_offset") == 0, F.col("active_users"))
        )
        .over(size_w)
        .alias("cohort_size"),
        "cohort_p",
    ).select(
        "cohort",
        "period_offset",
        "active_users",
        "cohort_size",
        F.expr("(10000 * active_users) div cohort_size").alias(
            "retention_bp"
        ),
    )
