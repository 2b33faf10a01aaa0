"""Regression guard for the driver-harness environment: a subprocess
with a *vanilla* SparkSession (none of our factory confs), non-UTC
timezone, and a neutral cwd must be able to run entry() and the queries
that ship code to Python workers."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
q = m.queries()
assert len(m.entry(spark).collect()) > 0
SF = "/root/testdata/sf0.001"
checks = {
    "ref_ingest_datasource_end_to_end": 15,   # DataSource + parse + silver
    "ref_ingest_fights_end_to_end": 6,        # fight DataSource chain
    "events_fixed_windows": None,             # TZ-sensitive windows
    "multimodal_decode_frames": None,         # mapInPandas
}
for name, expect in checks.items():
    n = q[name](spark, SF).count()
    assert n > 0 and (expect is None or n == expect), (name, n)
print("DRIVER_CONTRACT_OK")
"""

#: every registered query must RUN under the hostile session (the driver
#: executes all 50 in its own session — a TZ/conf/pickling problem in any
#: one of them is a red CORRECTNESS row), and its output must survive the
#: driver's rows canonicalization (sort columns by name, sort_values over
#: all of them, hash cells) — an array/struct-typed cell crashes that
#: comparator, which was round 1's only hard failure. Row values are
#: covered by test_oracle_parity; here we prove execution + driver-safe
#: output shape.
SWEEP_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.001"
failures = []
for name, fn in m.queries().items():
    try:
        pdf = fn(spark, SF).toPandas()
        assert len(pdf.columns) > 0
        # simulate the driver's canonicalization: every cell must be
        # scalar-hashable and the frame sortable over all columns.
        cols = sorted(pdf.columns)
        pdf[cols].sort_values(by=cols).apply(
            lambda row: hash(tuple(row)), axis=1
        )
    except Exception as e:
        failures.append((name, repr(e)[:300]))
assert not failures, failures
print("DRIVER_SWEEP_OK")
"""


def _run_subprocess(script: str, marker: str, timeout: int) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert marker in proc.stdout, (
        proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    )


#: the timezone-trap guard: these queries' VALUES (not just execution)
#: must match the DuckDB oracle under a non-UTC vanilla session — the
#: class of bug the round-2 testdata regeneration exposed (NTZ-vs-LTZ
#: epoch math silently shifting every event time).
VALUE_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from _compare import assert_frames_match
import __spark_entry__ as m
from pyspark.sql import SparkSession
import duckdb

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
q, o = m.queries(), m.oracle_sql()
for name in ["q1_pricing_summary", "events_fixed_windows",
             "events_user_sessions", "asof_join_purchase_click",
             "events_resample_ffill", "corpus_mix_split_shards"]:
    assert_frames_match(
        q[name](spark, SF).toPandas(), con.execute(o[name]).df(), name)
print("HOSTILE_VALUES_OK")
"""


def test_vanilla_session_from_neutral_cwd():
    _run_subprocess(SCRIPT, "DRIVER_CONTRACT_OK", 420)


def test_timezone_sensitive_values_in_hostile_session():
    _run_subprocess(VALUE_SCRIPT, "HOSTILE_VALUES_OK", 420)


def test_all_queries_run_in_hostile_session():
    _run_subprocess(SWEEP_SCRIPT, "DRIVER_SWEEP_OK", 560)


def test_bench_tier_names_resolve_in_registry():
    """bench.py's HEADLINE/EXTENDED names must all resolve (DIRECT-map
    callables or registry slots) — a slot rename would otherwise crash
    the driver's per-round bench run instead of failing a test."""
    import bench

    from sports_stats_data_pipeline_spark.plans import all_registries

    reg = all_registries()
    for name in bench.HEADLINE:
        assert name in bench.DIRECT or name in reg.queries, name
    for name in bench.EXTENDED:
        assert name in reg.queries, name
    # every DIRECT override must be a headline slot, never dangle
    assert set(bench.DIRECT) <= set(bench.HEADLINE)
    # the calibration pass (round 7) resolves each headline slot's
    # oracle through ORACLE_PROXY — a proxy pointing at a renamed slot
    # would silently degrade the run to no-ratio
    for name in bench.HEADLINE:
        source = bench.ORACLE_PROXY.get(name, name)
        if source is not None:
            assert source in reg.oracles, (name, source)
    assert set(bench.ORACLE_PROXY) <= set(bench.HEADLINE)
    # the round-8 extended calibration resolves oracles directly by
    # slot name — every calibrated slot must be an EXTENDED member with
    # a registered oracle, or the tier silently degrades to no-ratio
    assert set(bench.EXTENDED_CALIBRATED) <= set(bench.EXTENDED)
    for name in bench.EXTENDED_CALIBRATED:
        assert name in reg.oracles, name
