"""Multi-touch attribution: hand-anchored credits, boundary semantics,
credit-sum invariants, cap behavior, and a DuckDB twin on real events."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.attribution import (
    FULL_BP,
    attribute_conversions,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, 0.0)
            for i, (m, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_hand_anchored_models(spark):
    # user 1: touches at t=0 (view), t=10 (click), t=20 (click),
    # conversion at t=30 -> n=3
    rows = [
        (0, 1, "view"),
        (10, 1, "click"),
        (20, 1, "click"),
        (30, 1, "purchase"),
        # user 2: single touch
        (5, 2, "click"),
        (6, 2, "purchase"),
        # user 3: no touches in window (touch AFTER conversion)
        (50, 3, "purchase"),
        (60, 3, "click"),
    ]
    out = attribute_conversions(_ev(spark, rows), lookback_s=3600)
    got = {
        (r["conv_id"], r["touch_id"]): r for r in out.collect()
    }
    assert set(got) == {(3, 0), (3, 1), (3, 2), (5, 4)}
    t0, t1, t2 = got[(3, 0)], got[(3, 1)], got[(3, 2)]
    assert (t0["touch_rank"], t1["touch_rank"], t2["touch_rank"]) == (1, 2, 3)
    assert [t0["first_touch_bp"], t1["first_touch_bp"], t2["first_touch_bp"]] == [
        FULL_BP, 0, 0,
    ]
    assert [t0["last_touch_bp"], t1["last_touch_bp"], t2["last_touch_bp"]] == [
        0, 0, FULL_BP,
    ]
    assert {r["linear_bp"] for r in (t0, t1, t2)} == {FULL_BP // 3}
    assert [t0["position_bp"], t1["position_bp"], t2["position_bp"]] == [
        4000, 2000, 4000,
    ]
    solo = got[(5, 4)]
    assert (
        solo["first_touch_bp"], solo["last_touch_bp"],
        solo["linear_bp"], solo["position_bp"],
    ) == (FULL_BP, FULL_BP, FULL_BP, FULL_BP)


def test_lookback_boundaries(spark):
    # lookback 10 min: touch exactly at conv-10min is IN (inclusive
    # lower bound), touch at conv_ts is OUT (strictly earlier)
    rows = [
        (0, 1, "click"),   # == conv - 10 min -> in
        (10, 1, "purchase"),
        (10, 2, "click"),  # == conv ts -> out
        (10, 2, "purchase"),
    ]
    df = _ev(spark, rows)
    out = attribute_conversions(df, lookback_s=600)
    assert [(r["conv_id"], r["touch_id"]) for r in out.collect()] == [(1, 0)]
    # one second less lookback excludes the boundary touch
    assert attribute_conversions(df, lookback_s=599).count() == 0


def test_two_touch_split_and_cap(spark):
    rows = [
        (0, 1, "view"),
        (5, 1, "click"),
        (9, 1, "purchase"),
    ]
    out = attribute_conversions(_ev(spark, rows), lookback_s=3600).collect()
    assert {r["position_bp"] for r in out} == {FULL_BP // 2}
    # cap at 1: only the EARLIEST touch survives, and the models see n=1
    capped = attribute_conversions(
        _ev(spark, rows), lookback_s=3600, max_touches_per_conversion=1
    ).collect()
    assert len(capped) == 1
    assert capped[0]["touch_id"] == 0 and capped[0]["n_touches"] == 1
    assert capped[0]["position_bp"] == FULL_BP


def test_credit_sum_invariants_on_real_events(spark):
    e = load_table(spark, SF_SMOKE, "events")
    out = attribute_conversions(e, lookback_s=24 * 3600)
    sums = (
        out.groupBy("conv_id", "n_touches")
        .agg(
            F.sum("first_touch_bp").alias("f"),
            F.sum("last_touch_bp").alias("l"),
            F.sum("linear_bp").alias("lin"),
            F.sum("position_bp").alias("pos"),
        )
        .collect()
    )
    assert len(sums) > 0
    for r in sums:
        assert r["f"] == FULL_BP  # exactly one first touch
        assert r["l"] == FULL_BP  # exactly one last touch
        assert FULL_BP - r["n_touches"] < r["lin"] <= FULL_BP
        assert r["pos"] <= FULL_BP


def test_duckdb_twin_on_real_events(spark):
    import duckdb

    out = (
        attribute_conversions(
            load_table(spark, SF_SMOKE, "events"), lookback_s=24 * 3600
        )
        .orderBy("conv_id", "touch_rank")
        .collect()
    )
    got = [
        (
            r["conv_id"], r["user"], r["conv_us"], r["touch_id"],
            r["touch_us"], r["touch_type"], r["n_touches"], r["touch_rank"],
            r["first_touch_bp"], r["last_touch_bp"], r["linear_bp"],
            r["position_bp"],
        )
        for r in out
    ]
    con = duckdb.connect()
    want = con.execute(f"""
      WITH events AS (
        SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')
      ),
      pairs AS (
        SELECT c.event_id AS conv_id, c.user_id AS usr,
               epoch_us(c.ts) AS conv_us, t.event_id AS touch_id,
               epoch_us(t.ts) AS touch_us, t.event_type AS touch_type
        FROM events c JOIN events t ON t.user_id = c.user_id
        WHERE c.event_type = 'purchase'
          AND t.event_type IN ('click', 'view')
          AND epoch_us(t.ts) < epoch_us(c.ts)
          AND epoch_us(t.ts) >= epoch_us(c.ts) - 86400000000
      ),
      ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY touch_us, touch_id) AS rk,
               COUNT(*) OVER (PARTITION BY conv_id) AS n
        FROM pairs
      )
      SELECT conv_id, usr, conv_us, touch_id, touch_us, touch_type,
             n, rk,
             CASE WHEN rk = 1 THEN 10000 ELSE 0 END,
             CASE WHEN rk = n THEN 10000 ELSE 0 END,
             10000 // n,
             CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000
                  WHEN rk = 1 OR rk = n THEN 4000
                  ELSE 2000 // (n - 2) END
      FROM ranked ORDER BY conv_id, rk
    """).fetchall()
    con.close()
    assert got == [tuple(w) for w in want]


def test_bad_args_rejected(spark):
    df = _ev(spark, [(0, 1, "click"), (1, 1, "purchase")])
    with pytest.raises(ValueError):
        attribute_conversions(df, lookback_s=0)
    with pytest.raises(ValueError):
        attribute_conversions(df, max_touches_per_conversion=0)


def test_bot_guard_excludes_on_relevant_counts_only(spark):
    """max_events_per_user (round-10 skew guard): a user past the cap
    in CONVERSION+TOUCH-type events is excluded entirely; a user past
    the cap only in unrelated event types is untouched; None disables.
    """
    rows = (
        # user 1: 4 relevant events (under any cap we set) -> kept
        [(0, 1, "view"), (10, 1, "click"), (20, 1, "click"),
         (30, 1, "purchase")]
        # user 2: 3 relevant events + a flood of irrelevant 'error'
        # events — must NOT count against the cap
        + [(0, 2, "view"), (5, 2, "click"), (9, 2, "purchase")]
        + [(m, 2, "error") for m in range(40, 52)]
        # user 3: a bot — 12 relevant events, all clicks + purchases
        + [(m, 3, "click") for m in range(10)]
        + [(35, 3, "purchase"), (36, 3, "purchase")]
    )
    df = _ev(spark, rows)
    out = attribute_conversions(
        df, lookback_s=3600, max_events_per_user=10
    )
    users = {r["user"] for r in out.select("user").distinct().collect()}
    assert users == {1, 2}, users  # bot (user 3) excluded entirely
    # user 2's 12 'error' rows did not count: 3 relevant <= 10 -> kept
    assert out.filter(F.col("user") == 2).count() == 2  # view+click
    # disabling the guard brings the bot back
    out_all = attribute_conversions(
        df, lookback_s=3600, max_events_per_user=None
    )
    assert out_all.filter(F.col("user") == 3).count() > 0
    with pytest.raises(ValueError, match="max_events_per_user"):
        attribute_conversions(df, max_events_per_user=0)


def test_bot_guard_exclusion_is_observable(spark):
    """The cap's row loss is not silent (round-10 ADVICE): an observed
    metric reports how many users the eligibility semi-join dropped,
    computed by the same action that runs the query."""
    from pyspark.sql import Observation

    rows = (
        [(0, 1, "view"), (10, 1, "purchase")]
        + [(m, 3, "click") for m in range(10)]
        + [(35, 3, "purchase")]
        + [(m, 4, "click") for m in range(12)]
        + [(40, 4, "purchase")]
    )
    df = _ev(spark, rows)
    obs = Observation("excl")
    out = attribute_conversions(
        df, lookback_s=3600, max_events_per_user=10,
        exclusion_metric=obs,
    )
    assert out.count() > 0  # action materializes the metric
    assert obs.get["excluded_users"] == 2  # users 3 (11) and 4 (13)
    # default string metric must not change results or error
    out_named = attribute_conversions(
        df, lookback_s=3600, max_events_per_user=10
    )
    assert out_named.count() == out.count()
    # disabled: no CollectMetrics node in the plan
    out_off = attribute_conversions(
        df, lookback_s=3600, max_events_per_user=10,
        exclusion_metric=None,
    )
    assert "CollectMetrics" not in out_off._jdf.queryExecution().toString()
    # an Observation with the guard DISABLED would never attach and
    # .get would block forever — refused loudly instead
    with pytest.raises(ValueError, match="exclusion_metric"):
        attribute_conversions(
            df, max_events_per_user=None, exclusion_metric=Observation()
        )


def test_default_metric_composes_and_empty_counts_read_zero(spark):
    """Round-11 ADVICE: (a) two DEFAULT-named attributions composed
    into ONE query must not collide on the observed-metric name (the
    default is auto-uniquified per process); (b) with the guard on but
    zero relevant events, excluded_users must read 0, not NULL (SUM
    over an empty relation is NULL without the coalesce)."""
    rows = [(0, 1, "view"), (10, 1, "purchase"), (5, 2, "click"),
            (6, 2, "purchase")]
    df = _ev(spark, rows)
    a = attribute_conversions(df, lookback_s=3600, max_events_per_user=10)
    b = attribute_conversions(df, lookback_s=600, max_events_per_user=10)
    # pre-fix this raised AnalysisException (duplicate observed metric)
    assert a.unionByName(b).count() == a.count() + b.count()

    # Observation delivery is GUARANTEED even when the result is
    # runtime-empty (AQE would fold an in-branch CollectMetrics away;
    # the operator pads the metric through the top of the plan).
    # (a) zero relevant events -> 0, never NULL / never missing.
    from pyspark.sql import Observation

    obs = Observation("excl_zero")
    empty_rel = attribute_conversions(
        load_table(spark, SF_SMOKE, "events"),
        conversion_type="no_such_type_xyz",
        touch_types=("also_absent_xyz",),
        lookback_s=3600, max_events_per_user=10, exclusion_metric=obs,
    )
    assert empty_rel.count() == 0
    assert obs.get["excluded_users"] == 0  # was None pre-coalesce
    # (b) EVERY user excluded -> result empty but the count must still
    # read the true number, not 0 — the exclusions CAUSED the
    # emptiness and hiding that would be the worst possible lie.
    obs_all = Observation("excl_all")
    rows_hot = (
        [(m, 7, "click") for m in range(5)] + [(30, 7, "purchase")]
        + [(m, 8, "view") for m in range(4)] + [(31, 8, "purchase")]
    )
    out_all_excluded = attribute_conversions(
        _ev(spark, rows_hot), lookback_s=3600,
        max_events_per_user=3, exclusion_metric=obs_all,
    )
    assert out_all_excluded.count() == 0
    assert obs_all.get["excluded_users"] == 2
