"""Multi-touch conversion attribution.

The marketing-analytics workhorse the reference's event data implies but
never computes (reference scrapers stop at ingest; cf. SURVEY.md §2's
events family): for every conversion event, find the touchpoint events
that preceded it within a lookback window and split the conversion
credit across them under the standard models — first-touch, last-touch,
linear, and U-shaped (position-based).

Credit is emitted in integer basis points (10_000 = full credit) with
floor division, never floats — the repo-wide determinism convention
(plans/__init__.py): results are bit-identical across engines and
partitionings, and a DuckDB twin can hash-match them. The flooring
remainder is documented, not hidden: ``sum(linear_bp) <= 10000`` per
conversion with equality iff ``n_touches`` divides 10_000.

Model semantics (rank 1 = earliest touch, ties broken by event id):
- ``first_touch_bp``: 10_000 on rank 1, else 0.
- ``last_touch_bp``:  10_000 on rank n, else 0.
- ``linear_bp``:      10_000 // n for every touch.
- ``position_bp``:    U-shaped 40/20/40 — n=1: 10_000; n=2: 5_000 each;
  n>=3: 4_000 on first and last, 2_000 // (n-2) on each middle touch.

Scale design (100 TB event log):
- The touch<->conversion pairing is an equi-join on the user key with a
  residual time-range predicate — Spark plans it as one shuffle join on
  ``user``; no cross join, no window over the whole log. Hot users are
  the usual skew risk — and PER USER the pairing is quadratic, so a
  bot-grade account blows the join up before any post-join cap can
  help. ``max_events_per_user`` (default 10k — the same THRESHOLD as
  funnel_steps, but different semantics: this EXCLUDES the user from
  both sides based on relevant-type counts, funnel TRUNCATES to
  earliest-N and still emits) guards the join up front; bound the
  credited set further with ``max_touches_per_conversion``
  (earliest-N, deterministic, applied BEFORE credit so the models see
  the capped set).
- Ranking/credit is one window partitioned by the conversion id —
  partitions are bounded by touches-per-conversion (<= lookback x user
  rate), never by user or table size.
- Every expression is codegen (no UDF).
"""

from __future__ import annotations

import itertools
from typing import Sequence

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

__all__ = ["attribute_conversions"]

FULL_BP = 10_000

# Observed-metric names must be unique within one query; the DEFAULT
# name is auto-uniquified with this per-process counter so two default
# attributions composed into one plan (e.g. a union) don't collide
# with a duplicate-observed-metric AnalysisException (round-11 ADVICE).
# Callers who pass an explicit string own its uniqueness — and get it
# VERBATIM, even when it happens to equal the default base name: the
# default is a private sentinel object, not a magic string value
# (round-12 self-review — a listener keyed on an explicitly-passed
# 'attribution_excluded_users' must keep matching).
_DEFAULT_METRIC = "attribution_excluded_users"
_metric_seq = itertools.count()


class _UseDefaultMetric:
    def __repr__(self) -> str:  # readable in signatures/help()
        return f"<default: {_DEFAULT_METRIC}_<n>>"


_USE_DEFAULT_METRIC = _UseDefaultMetric()


def attribute_conversions(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    lookback_s: int = 24 * 3600,
    ts: str = "ts",
    user: str = "user_id",
    event_id: str = "event_id",
    event_type: str = "event_type",
    max_touches_per_conversion: int | None = None,
    max_events_per_user: int | None = 10_000,
    exclusion_metric: "str | Observation | None" = _USE_DEFAULT_METRIC,
) -> DataFrame:
    """One row per (conversion, touch) pair with the credit models.

    A touch qualifies when ``conv_us - lookback_s*1e6 <= touch_us <
    conv_us`` (strictly earlier; the lower bound is inclusive).
    Conversions with zero qualifying touches emit nothing — attribution
    is a statement about touchpoints, and "unattributed conversions" is
    an anti-join the caller can do in one line.

    ``max_events_per_user`` (default 10 000) EXCLUDES — entirely, both
    conversion and touch side — any user whose count of relevant
    events (``conversion_type`` + ``touch_types``; other event types
    don't count) exceeds the cap: the per-user pairing is quadratic and
    a bot-grade account otherwise explodes the join itself (see the
    in-body comment). Pass ``None`` to disable. This differs from
    funnel_steps' same-named parameter, which TRUNCATES instead of
    excluding — only the threshold value is shared.

    Exclusion is never silent: an observed metric (``df.observe`` /
    CollectMetrics) named ``exclusion_metric`` reports
    ``excluded_users``, the number of accounts the cap dropped. Pass a
    ``pyspark.sql.Observation`` to read it programmatically
    (``obs.get["excluded_users"]`` after any action on the result —
    guaranteed to land even when the result is runtime-empty, at the
    cost of one extra tiny aggregate stage; see the in-body comment),
    a string to surface it to QueryExecutionListeners / the Spark UI
    zero-extra-cost (telemetry-grade: absent from executions whose
    result AQE folds to empty at runtime), or
    ``None`` to disable. Observed-metric names must be unique within
    one query; the DEFAULT name is auto-uniquified with a per-process
    counter suffix so composing two default attributions in one plan
    (e.g. a union) just works — an explicitly-passed name is used
    verbatim, and its uniqueness is the caller's to manage. With the
    guard on but zero relevant events, ``excluded_users`` reads 0
    (never NULL).

    Returns (conv_id, user, conv_us, touch_id, touch_us, touch_type,
    n_touches, touch_rank, first_touch_bp, last_touch_bp, linear_bp,
    position_bp) with all epochs in microseconds BIGINT and all credits
    in integer basis points.
    """
    if lookback_s <= 0:
        raise ValueError("lookback_s must be positive")
    if max_touches_per_conversion is not None and max_touches_per_conversion < 1:
        raise ValueError("max_touches_per_conversion must be >= 1")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1")
    if max_events_per_user is None and isinstance(
        exclusion_metric, Observation
    ):
        # an Observation that never attaches to a plan blocks forever
        # on .get — refuse loudly instead (the guard is off, so there
        # is no exclusion count to observe)
        raise ValueError(
            "exclusion_metric=Observation requires max_events_per_user "
            "to be set — with the guard disabled the metric would "
            "never attach and Observation.get would block forever"
        )

    # Bot guard (round-10 skew finding): the conv x touch pairing is
    # quadratic PER USER, and max_touches_per_conversion only trims the
    # window AFTER the join has materialized the pairs — a single
    # account holding 40% of a 30x-replica event log produced ~1e11
    # join-candidate pairs in ONE shuffle partition and hung the stage.
    # Users whose count of RELEVANT events (conversion_type +
    # touch_types — the quantities that actually drive the quadratic;
    # unrelated event types don't count against a user) exceeds the
    # cap are EXCLUDED from attribution entirely, both sides —
    # truncating a touch history would silently misassign credit, so
    # exclusion is the honest treatment of bot-grade accounts. NOTE:
    # funnel_steps shares only the 10k THRESHOLD, not the semantics
    # (it TRUNCATES to each user's earliest-N step-type events and
    # still emits the user). The aggregate is map-side combinable and
    # the semi-join shares the pairing join's user-key shuffle; at
    # driver SFs (<~1k events/user) the cap is unhittable, and the
    # DuckDB oracle (plans/events.py attrib leg) mirrors it exactly.
    if max_events_per_user is not None:
        relevant_types = [conversion_type, *touch_types]
        counts = (
            events.filter(F.col(event_type).isin(relevant_types))
            .groupBy(F.col(user).alias("__u"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        counts_raw = counts
        want_obs = isinstance(exclusion_metric, Observation)
        if exclusion_metric is not None and not want_obs:
            # String-named telemetry metric: CollectMetrics over the
            # per-user counts — rides the same action as the query
            # itself (no extra job) and makes the cap's row loss
            # detectable (round-10 ADVICE) instead of users silently
            # vanishing. The default name gets a per-process suffix so
            # two default-named attributions compose in one plan;
            # coalesce because SUM over an empty counts relation is
            # NULL, and "no relevant events" must read 0, not None.
            # The range(1) sentinel (NULL key — can never equi-match
            # the semi join; __n=0 — never counts as excluded) keeps
            # the node from being statically folded away over an empty
            # input. CAVEAT (telemetry-grade by design): if the QUERY
            # RESULT is empty at runtime, AQE's empty-relation
            # propagation can remove this branch from the final plan
            # and the metric is simply absent from that execution —
            # listeners must treat absence as "not observed". The
            # Observation path below pays one extra tiny aggregate to
            # guarantee delivery instead.
            name = exclusion_metric
            if name is _USE_DEFAULT_METRIC:
                name = f"{_DEFAULT_METRIC}_{next(_metric_seq)}"
            utype = events.schema[user].dataType.simpleString()
            sentinel = events.sparkSession.range(1).select(
                F.lit(None).cast(utype).alias("__u"),
                F.lit(0).cast("long").alias("__n"),
            )
            counts = counts.unionByName(sentinel).observe(
                name,
                F.coalesce(
                    F.sum(
                        (F.col("__n") > max_events_per_user).cast("long")
                    ),
                    F.lit(0).cast("long"),
                ).alias("excluded_users"),
            )
        eligible = counts.filter(F.col("__n") <= max_events_per_user).select(
            F.col("__u").alias(user)
        )
        events = events.join(eligible, user, "left_semi")
    else:
        counts_raw = None
        want_obs = False

    conv = events.filter(F.col(event_type) == conversion_type).select(
        F.col(user).alias("user"),
        F.col(event_id).alias("conv_id"),
        F.unix_micros(F.col(ts)).alias("conv_us"),
    )
    touch = events.filter(F.col(event_type).isin(list(touch_types))).select(
        F.col(user).alias("user"),
        F.col(event_id).alias("touch_id"),
        F.unix_micros(F.col(ts)).alias("touch_us"),
        F.col(event_type).alias("touch_type"),
    )
    lookback_us = int(lookback_s) * 1_000_000
    pairs = conv.join(touch, "user").filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(lookback_us))
    )

    w_asc = Window.partitionBy("conv_id").orderBy("touch_us", "touch_id")
    pairs = pairs.withColumn("touch_rank", F.row_number().over(w_asc))
    if max_touches_per_conversion is not None:
        pairs = pairs.filter(
            F.col("touch_rank") <= max_touches_per_conversion
        )
        # ranks are already 1..cap and contiguous after the earliest-N
        # cut (row_number has no gaps), so no re-rank is needed.
    w_all = Window.partitionBy("conv_id")
    n = F.count(F.lit(1)).over(w_all)
    rk = F.col("touch_rank")
    first_bp = F.when(rk == 1, F.lit(FULL_BP)).otherwise(F.lit(0))
    last_bp = F.when(rk == n, F.lit(FULL_BP)).otherwise(F.lit(0))
    linear_bp = F.expr(f"{FULL_BP} div n_touches")
    position_bp = (
        F.when(n == 1, F.lit(FULL_BP))
        .when(n == 2, F.lit(FULL_BP // 2))
        .when((rk == 1) | (rk == n), F.lit(4_000))
        .otherwise(F.expr("2000 div (n_touches - 2)"))
    )
    out = (
        pairs.withColumn("n_touches", n)
        .select(
            "conv_id",
            "user",
            "conv_us",
            "touch_id",
            "touch_us",
            "touch_type",
            "n_touches",
            "touch_rank",
            first_bp.cast("long").alias("first_touch_bp"),
            last_bp.cast("long").alias("last_touch_bp"),
            linear_bp.cast("long").alias("linear_bp"),
            position_bp.cast("long").alias("position_bp"),
        )
    )
    if want_obs:
        # Observation is a PROGRAMMATIC contract — .get must return
        # after any action, never block or error. An observe buried on
        # the counts branch cannot promise that: when the query result
        # is empty at runtime, AQE's empty-relation propagation folds
        # the join and the CollectMetrics node vanishes from the final
        # plan, losing the already-accumulated row (measured: raw
        # metrics row reads [] with AQE on, [0] with it off). A
        # CollectMetrics node at the TOP of the plan over a
        # never-empty child survives (measured), so: compute the
        # excluded count as a 1-row global aggregate over counts
        # (ReuseExchange dedupes the counts shuffle with the eligible
        # leg's — the extra cost is one tiny stage, accepted for
        # delivery), pad it into the output relation as one marker
        # row, observe max() over the union, then filter the marker
        # back out. Global aggregates always emit exactly one row, so
        # the union is never empty and the metric always lands.
        excl = counts_raw.agg(
            F.coalesce(
                F.sum((F.col("__n") > max_events_per_user).cast("long")),
                F.lit(0).cast("long"),
            ).alias("__excl")
        )
        pad = excl.select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in out.schema.fields
            ],
            F.col("__excl"),
            F.lit(1).alias("__pad"),
        )
        observed = (
            out.select(
                "*",
                F.lit(None).cast("long").alias("__excl"),
                F.lit(0).alias("__pad"),
            )
            .unionByName(pad)
            .observe(
                exclusion_metric,
                F.coalesce(F.max("__excl"), F.lit(0).cast("long")).alias(
                    "excluded_users"
                ),
            )
        )
        out = observed.filter(F.col("__pad") == 0).drop("__excl", "__pad")
    return out
