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
    "events_tumbling_hourly": None,           # ns-parquet + TZ-sensitive
    "multimodal_decode_frames": None,         # mapInPandas
}
for name, expect in checks.items():
    n = q[name](spark, SF).count()
    assert n > 0 and (expect is None or n == expect), (name, n)
print("DRIVER_CONTRACT_OK")
"""


def test_vanilla_session_from_neutral_cwd():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "DRIVER_CONTRACT_OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    )
