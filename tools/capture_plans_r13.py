"""Capture .explain("formatted") for every query slot the round-13
optimization touched, for plans/r13/<slot>_{before,after}.txt.

Run from the repo root whose code should be captured (a round-12-HEAD
worktree for *_before.txt, HEAD for *_after.txt):

    python tools/capture_plans_r13.py <out_dir> <suffix>

Uses the same session factory and sf0.1 data as bench.py so the plans
match what the bench measures. Building some of these DataFrames
executes bounded driver-side work by design (heavy-hitter candidate
collect, the corpus model pre-collect); that is the same work the
bench times, so the captured plan is the plan of record.
"""

from __future__ import annotations

import datetime
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, os.getcwd())

from sports_stats_data_pipeline_spark.plans import all_registries  # noqa: E402
from sports_stats_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: slots whose plan shape the round-13 diff (bdb9eaa..HEAD) changed.
TOUCHED = (
    "corpus_quality_filter",
    "data_quality_report",
    "events_props_pivot",
    "orders_by_period_rangejoin",
)


def _explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_registries()
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat()
    for name in TOUCHED:
        df = reg.queries[name](spark, SF_DIR)
        text = (
            f"# {name} — explain('formatted') at sf0.1, {suffix} "
            f"round-13 optimization\n"
            f"# captured {stamp} by tools/capture_plans_r13.py\n\n"
            + _explain_text(df)
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"captured {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
