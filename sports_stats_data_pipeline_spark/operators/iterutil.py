"""Checkpoint bookkeeping for iterative operators.

``DataFrame.localCheckpoint(eager=True)`` registers its blocks directly
with the JVM SparkContext, NOT the SQL cache manager — so a later
``DataFrame.unpersist()`` is a silent no-op (verified live on Spark
4.1.2: the RDD stays in ``sc.getPersistentRDDs`` after unpersist) and a
k-round loop pins k copies of its state until nondeterministic GC +
ContextCleaner reap them. This helper returns an explicit release
handle found by diffing the context's persistent-RDD registry around
the checkpoint call.

Single-threaded-driver assumption: a concurrent persist between the
before/after snapshots would be mis-attributed to this checkpoint.
Iterative operators drive their loops from one thread, so that is the
documented contract rather than a lock.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

__all__ = ["eager_checkpoint"]


def eager_checkpoint(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """``df.localCheckpoint(eager=True)`` plus a ``free()`` that really
    releases the checkpoint blocks (see module docstring)."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    new_ids = after - before

    def free() -> None:
        reg = sc._jsc.getPersistentRDDs()
        for rid in new_ids:
            if reg.containsKey(rid):
                reg.get(rid).unpersist(False)

    return out, free
