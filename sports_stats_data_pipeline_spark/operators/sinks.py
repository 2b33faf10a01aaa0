"""Crash-safe replacement of a parquet sink directory.

Parquet has no transactional MERGE (that is Delta's job at production
scale); this is the no-Delta stand-in shared by the batch scrape ingest
(sources.scrape_pipeline) and the streaming upsert (streaming.pipeline):

    write ``<sink>.staging`` → rename live aside to ``<sink>.old`` →
    promote staging → drop ``.old``

The protocol guarantees CRASH-RECOVERABILITY, not continuous read
availability: between the two renames the live path briefly does not
exist (a concurrent reader can see FileNotFoundError for that instant),
but a crash at ANY point leaves a state from which :func:`recover_sink`
restores a complete sink — previously merged rows are never lost. The
old rmtree-then-rename approach had a window where a crash lost the
entire sink and a replayed batch would rebuild from itself alone.
"""

from __future__ import annotations

import os
import shutil


def promote_staging(sink_path: str) -> None:
    """Promote a fully-written ``<sink>.staging`` dir to the live sink:
    rename live aside to ``.old`` (never rmtree it first), promote
    staging, then drop ``.old``."""
    old = sink_path + ".old"
    if os.path.exists(sink_path):
        os.rename(sink_path, old)
    os.rename(sink_path + ".staging", sink_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_sink(sink_path: str) -> None:
    """Restore the newest complete sink from whatever combination of
    ``.staging``/``.old`` a crash left behind.

    Invariant the protocol maintains: the live dir is only renamed to
    ``.old`` AFTER the staging write completed — so if the live dir is
    missing and ``.old`` exists, staging is complete and can be promoted;
    a ``.staging`` left while the live dir exists is an unfinished write
    and is discarded.
    """
    tmp, old = sink_path + ".staging", sink_path + ".old"
    if not os.path.exists(sink_path):
        if os.path.exists(tmp) and os.path.exists(old):
            # crashed between the two renames: staging was complete.
            os.rename(tmp, sink_path)
            shutil.rmtree(old)
        elif os.path.exists(old):
            os.rename(old, sink_path)
    elif os.path.exists(old):
        # crashed before cleanup; the live dir is the newer state.
        shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
