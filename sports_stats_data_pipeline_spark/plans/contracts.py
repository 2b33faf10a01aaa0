"""Loud contracts on driver-testdata assumptions.

Several oracles are exact only inside a documented regime of the
synthesized corpus (the NOTES.md "watch list for regenerated
testdata"): the streaming LSH slot assumes no band bucket exceeds the
skew cap, SemDeDup's synthesized near-dup margin assumes unit-norm
embeddings, the sketch oracle assumes sub-exact-regime cardinalities,
and the URL slot assumes its synthesized hosts always parse. A
driver-side testdata regeneration (it happened in rounds 2 and 3) used
to surface those as OPAQUE value-hash mismatches costing a debugging
session each; :func:`require` runs a bounded eager aggregate inside the
query builder and raises a NAMED violation instead.

Cost: one small job per check over a bounded relation (the 500-row
documents/embeddings tables, or a grouped aggregate whose output is
group-cardinality-sized). The queries that carry checks either already
do eager work (streaming slots, mart writes) or are correctness-gate
composites where a sub-second job is the price of a diagnosable
failure; none of the checks sit on a headline-bench query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TestdataContractViolation", "require"]


class TestdataContractViolation(AssertionError):
    """A driver-corpus assumption an oracle depends on no longer holds
    — fix the query/oracle pair for the new corpus, don't silence."""


def require(
    df: DataFrame, ok: Column, name: str, detail: str, *metrics: Column
) -> None:
    """Eagerly evaluate aggregate ``ok`` over ``df``; raise a named
    :class:`TestdataContractViolation` when false, with the extra
    ``metrics`` aggregates in the message for one-look diagnosis."""
    row = df.agg(ok.alias("__ok"), *metrics).collect()[0]
    if not row["__ok"]:
        measured = {k: v for k, v in row.asDict().items() if k != "__ok"}
        raise TestdataContractViolation(
            f"testdata contract {name!r} violated: {detail}"
            + (f" (measured: {measured})" if measured else "")
        )
