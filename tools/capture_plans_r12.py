"""Capture .explain("formatted") for every query slot the round-12
optimization touched, for plans/r12/<slot>_{before,after}.txt.

Run from the repo root whose code should be captured (the round-11
worktree for *_before.txt, HEAD for *_after.txt):

    python tools/capture_plans_r12.py <out_dir> <suffix>

Uses the same session factory and sf0.1 data as bench.py so the plans
match what the bench measures.  Building some of these DataFrames
executes bounded driver-side work by design (heavy-hitter candidate
collect, iterative graph rounds, the mart lifecycle); that is the same
work the bench times, so the captured plan is the plan of record.

The streaming slot's round-12 change (flush-sentinel construction,
streaming/pipeline.py::_stage_with_flush) is inside a streaming
execution, so no end-of-query explain can show it; the sentinel
DataFrame is built here exactly as that revision's source builds it
and explained on its own.
"""

from __future__ import annotations

import datetime
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from sports_stats_data_pipeline_spark.plans import all_registries  # noqa: E402
from sports_stats_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: slots whose plan shape the round-12 diff (1171acc..HEAD) changed.
TOUCHED = (
    "neardup_doc_clusters",
    "corpus_quality_filter",
    "url_domain_curation",
    "data_quality_report",
    "span_redaction_stats",
    "asof_join_purchase_click",
)


def _explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _sentinel_df(spark, suffix: str):
    """The flush-sentinel relation exactly as the captured revision's
    streaming/pipeline.py::_stage_with_flush constructs it (before:
    r11 1171acc; after: the round-12 rewrite, commit 2397fff)."""
    flush_ts = datetime.datetime(2100, 1, 1)
    from sports_stats_data_pipeline_spark.streaming.pipeline import (
        _FLUSH_TYPE,
        EVENTS_RAW_SCHEMA,
    )

    if suffix == "before":
        return spark.createDataFrame(
            [(-1, flush_ts, -1, _FLUSH_TYPE, 0.0, "{}")],
            schema=EVENTS_RAW_SCHEMA,
        ).coalesce(1)
    return spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(flush_ts).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit(_FLUSH_TYPE).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    # optional explicit slot list (3rd+ args) — used by the optimization
    # round's continuation session to (re)capture only the slots IT
    # touched; no list = the original round-12 TOUCHED set + sentinel.
    slots = tuple(sys.argv[3:]) or TOUCHED
    capture_sentinel = not sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{suffix}")
    reg = all_registries().queries
    for name in slots:
        df = reg[name](spark, SF_DIR)
        text = _explain_text(df)
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(
            f"# {name} — explain('formatted') at sf0.1, {suffix} "
            f"round-12 optimization\n# captured by "
            f"tools/capture_plans_r12.py\n\n{text}"
        )
        print(f"wrote {path}")
    if not capture_sentinel:
        spark.stop()
        return
    df = _sentinel_df(spark, suffix)
    path = out_dir / f"streaming_flush_sentinel_{suffix}.txt"
    path.write_text(
        "# streaming flush sentinel (streaming/pipeline.py::"
        "_stage_with_flush) — the one-row relation each streaming "
        "execution writes to close the last window.\n"
        "# before: createDataFrame([row]).coalesce(1) — a Python-RDD-"
        "backed relation sliced over defaultParallelism whose "
        "coalesce(1) evaluates all 32 slices sequentially in one task "
        "(~4 s measured).\n"
        "# after: spark.range(1) + literal columns — pure JVM, one "
        "partition, same single output file and values.\n\n"
        + _explain_text(df)
    )
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
