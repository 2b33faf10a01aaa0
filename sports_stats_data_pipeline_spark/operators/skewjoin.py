"""Hot-key salted join: bound the straggler task a skewed join key makes.

A shuffle join hashes both sides by the join key, so every row of a hot
key (one user with 10^8 events, one boilerplate doc_id, the NULL-ish
sentinel key) lands in ONE task — at 100 TB that task runs for hours
while 999 executors idle. AQE's skew-join split handles the common case
at runtime, but only for sort-merge joins it can see and only within a
stage; a deliberate operator is still needed when (a) the plan AQE picks
is not splittable (e.g. the skewed side feeds a bucketed/co-located
join), (b) the job must produce stable partial outputs for incremental
maintenance (operators.incremental), or (c) the engine runs with AQE off.

The classic fix, implemented here as :func:`skew_join`:

1. find the hot keys — one tiny aggregate over the fact side
   (``count > hot_threshold``); broadcast it;
2. split fact and dim into hot / cold slices with broadcast semi/anti
   joins (no shuffle — the hot-key list is small by construction:
   at most ``|fact| / hot_threshold`` keys);
3. cold slice: the plain shuffle join (unskewed by definition);
4. hot slice: fact rows get a deterministic salt in ``[0, salt_factor)``
   (xxhash64 over the row — no ``rand()``, so retries/speculative tasks
   re-produce the same salt), the hot slice of dim is replicated
   ``salt_factor`` times via a small explode, and the join key becomes
   ``(key, salt)`` — the hot key's rows now spread over ``salt_factor``
   tasks;
5. union the two results (both sides, per fact row, emit exactly once).

Cost model at scale: the hot-key aggregate is map-side-combinable (bytes
~ distinct keys), dim replication is bounded by
``salt_factor × |dim ∩ hot_keys|`` — the handful of hot dim rows, NOT
the whole dim — and the per-task bound for a hot key drops from
``count(key)`` to ``count(key) / salt_factor``. Correctness does not
depend on the threshold: any key can go through either path with the
same result, so ``hot_threshold`` is purely a performance dial.

Supported join types: ``inner`` and ``left`` (salting is on the fact
side; each fact row carries exactly one salt, so per-row multiplicity is
preserved, including left-null extension). ``right``/``full`` would emit
unmatched DIM rows once per replica and are rejected — swap the sides
(right outer = left outer with fact/dim exchanged) instead.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """True when ``xxhash64`` accepts the type (MapType is unordered and
    rejected by the hash expression at analysis time, at any nesting
    depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def hot_keys(
    fact: DataFrame, keys: Sequence[str], hot_threshold: int
) -> DataFrame:
    """Keys whose fact-side row count exceeds ``hot_threshold`` — the
    relation is at most ``|fact| / hot_threshold`` rows, small enough to
    broadcast by construction."""
    return (
        fact.groupBy(*keys)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > hot_threshold)
        .select(*keys)
    )


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    hot_threshold: int = 100_000,
    salt_factor: int = 16,
) -> DataFrame:
    """Join ``fact`` with ``dim`` on ``keys``, salting the hot keys so no
    single task receives more than ~``count(hot_key) / salt_factor``
    rows. Result equals ``fact.join(dim, keys, how)`` exactly (row
    multiset); only the physical distribution differs.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_join supports 'inner' and 'left' (salting is fact-"
            f"side); for right/full swap the sides — got {how!r}"
        )
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    ks = list(keys)
    hot = F.broadcast(hot_keys(fact, ks, hot_threshold))

    fact_cold = fact.join(hot, ks, "left_anti")
    fact_hot = fact.join(hot, ks, "left_semi")
    cold = fact_cold.join(dim, ks, how)

    # Deterministic fact-side salt: hash the key columns plus every
    # hashable payload column (MapType is rejected by xxhash64 at any
    # nesting depth, so map columns are excluded rather than crashing
    # the whole join). Identical projections share a salt — fine for
    # spreading, since a hot KEY's rows differ in their payload columns;
    # a corpus of byte-identical rows is an exact-dedup problem, not a
    # join-skew problem. No rand(): task retries and speculative
    # duplicates must re-derive the same salt.
    salt_cols = [
        c for c, f in zip(fact_hot.columns, fact_hot.schema.fields)
        if _hashable(f.dataType)
    ]
    if set(salt_cols) <= set(ks):
        # no hashable non-key column distinguishes rows of a hot key —
        # every row of that key gets ONE salt and the hot task is not
        # split. Loud, not silent: the caller should add a hashable
        # discriminator column (e.g. a row id) to the fact side.
        warnings.warn(
            "skew_join: no hashable non-key fact column to salt on "
            "(map-typed payloads are excluded); salting degenerates to "
            "one salt per key value",
            stacklevel=2,
        )
    salted_fact = fact_hot.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*salt_cols), F.lit(salt_factor)).cast("int"),
    )
    # Only the hot slice of dim is replicated — semi-join first, then a
    # salt_factor-way explode. |dim_hot| == |hot keys ∩ dim|, tiny.
    dim_hot = dim.join(hot, ks, "left_semi")
    replicated_dim = dim_hot.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    hot_joined = salted_fact.join(
        replicated_dim, ks + ["__salt"], how
    ).drop("__salt")

    return cold.unionByName(hot_joined)
