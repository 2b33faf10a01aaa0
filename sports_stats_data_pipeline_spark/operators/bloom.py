"""Persisted Bloom filter — shuffle-pruning primitive for incremental
merge at scale.

The reference's resume path re-reads its entire sink and anti-joins every
incoming key against it (fighters_scraper.py:163-211 via
``operators.merge.insert_if_absent``). At 100 TB that anti-join shuffles
the full incoming relation against the full sink key set every run, even
when almost every incoming key is genuinely new. A Bloom filter of the
sink's keys inverts the cost: probe is a map-side expression (no
shuffle), *"definitely new"* rows skip the join entirely, and only the
*"maybe present"* sliver (true duplicates + the controlled
false-positive fraction) pays the exact anti-join. With an append-only
sink the filter is itself incremental — union the new keys' bits in and
re-persist (:func:`merge_blooms`), so successive runs never rescan the
sink.

Spark's AQE injects runtime bloom filters *within* one query
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the *cross-job* variant — the filter outlives the query, is saved as a
tiny parquet next to the sink, and is loaded by the next incremental run
(the same lifecycle as the reference's resume CSV, at ~10 bits/key
instead of the full key column).

Representation: one row ``(__bloom_m, __bloom_k, __bloom_words,
__bloom_bits array<bigint>)`` (dunder-prefixed so a probe's cross-join
never collides with user columns) —
a dense ``m_bits``-wide bitmap packed 64 bits/word. Build is one
explode + ``bit_or`` hash aggregate; probe broadcast-cross-joins the
single row and evaluates ``k`` AND-ed bit tests, all whole-stage-codegen
expressions (``xxhash64``/``pmod``/``shiftleft`` — no Python, no UDF).

No false negatives, ever (guaranteed by construction; pinned in
tests/test_bloom.py). False-positive rate ≈ ``(1 - e^{-k·n/m})^k``:
size ``m_bits ≈ 10·n`` with ``k = 7`` for ~1%. Engine-specific hashing
(``xxhash64``) means no DuckDB twin — correctness is pinned by the
membership/FP-rate/round-trip property tests instead.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_bloom",
    "probe_bloom",
    "merge_blooms",
    "insert_if_absent_bloom",
    "optimal_params",
]


def optimal_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Classic sizing: ``m = -n·ln(p)/ln(2)²`` bits, ``k = (m/n)·ln(2)``
    hashes. Returns ``(m_bits, k)`` with ``m`` rounded up to a whole
    64-bit word."""
    n = max(1, n_keys)
    m = math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / n) * math.log(2)))
    return m, k


def _positions(key: F.Column, m_bits: F.Column, k: int) -> list[F.Column]:
    """The k bit positions of a key: ``pmod(xxhash64(seed_i, key), m)``.

    The seed rides along as a literal hash input (PySpark's ``xxhash64``
    has no seed parameter); positions are in ``[0, m)`` so downstream
    word/bit indexing never leaves the bitmap.
    """
    return [
        F.pmod(F.xxhash64(F.lit(i), key), m_bits) for i in range(k)
    ]


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Aggregate the keys of ``df`` into a single-row Bloom bitmap.

    One narrow projection (k positions per key, explode), one ``bit_or``
    hash aggregate by 64-bit word (map-side combinable — network traffic
    is bounded by ``n_words``, not key count), then a dense-array
    assembly of the sparse words. Scale shape: the only shuffle moves at
    most ``n_words`` rows per map partition.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key_col), F.lit(m_bits), k))
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # F.shiftleft only takes a literal shift; call_function routes
            # to the SQL builtin, which accepts a column
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    sparse = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("sparse")
    )
    return sparse.select(
        F.lit(m_bits).alias("__bloom_m"),
        F.lit(k).alias("__bloom_k"),
        F.lit(n_words).alias("__bloom_words"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.try_element_at("sparse", w.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("__bloom_bits"),
    )


def probe_bloom(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    flag_col: str = "maybe_present",
) -> DataFrame:
    """Flag each row of ``df`` with whether its key *might* be in the
    filter (false ⇒ certainly absent).

    The single bloom row is broadcast-cross-joined (one tiny bitmap per
    executor); the k bit tests are pure codegen expressions over the
    joined ``bits`` array. ``m``/``k`` come from the bloom row itself so
    a persisted filter is self-describing.
    """
    k = bloom.select("__bloom_k").first()["__bloom_k"]
    probed = df.crossJoin(F.broadcast(bloom))
    checks = []
    for p in _positions(F.col(key_col), F.col("__bloom_m"), k):
        word = (p / 64).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        checks.append(
            F.coalesce(
                F.try_element_at("__bloom_bits", word + 1).bitwiseAND(mask) != 0,
                F.lit(False),
            )
        )
    hit = checks[0]
    for c in checks[1:]:
        hit = hit & c
    return probed.withColumn(flag_col, hit).drop(
        "__bloom_m", "__bloom_k", "__bloom_words", "__bloom_bits"
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two same-shaped filters (the append-only sink's incremental
    update: ``bloom(sink ∪ batch) == merge(bloom(sink), bloom(batch))``
    — exactly, since build is a pure bitwise OR of per-key patterns)."""
    left = a.select(
        "__bloom_m",
        "__bloom_k",
        "__bloom_words",
        F.col("__bloom_bits").alias("bits_a"),
    )
    right = b.select(
        F.col("__bloom_m").alias("mb"),
        F.col("__bloom_k").alias("kb"),
        F.col("__bloom_bits").alias("bits_b"),
    )
    joined = left.crossJoin(F.broadcast(right))
    mismatch = joined.filter(
        (F.col("__bloom_m") != F.col("mb")) | (F.col("__bloom_k") != F.col("kb"))
    )
    if mismatch.limit(1).count() > 0:
        raise ValueError("merge_blooms: filters have different m_bits/k")
    return joined.select(
        "__bloom_m",
        "__bloom_k",
        "__bloom_words",
        F.zip_with(
            "bits_a", "bits_b", lambda x, y: x.bitwiseOR(y)
        ).alias("__bloom_bits"),
    )


def insert_if_absent_bloom(
    existing: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    bloom: DataFrame,
) -> DataFrame:
    """Two-phase :func:`operators.merge.insert_if_absent` using a filter
    built over ``existing``'s keys.

    Phase 1 (map-side, no shuffle): rows whose key the bloom rules out
    are *certainly* new — they bypass the join. Phase 2: only the
    "maybe present" sliver anti-joins against the sink. Result is
    row-for-row identical to the plain operator (no false negatives ⇒
    no duplicate can slip through; false positives merely take the slow
    path). Single-column keys only — the bitmap is keyed on one hash
    input; concatenate upstream for compound keys.
    """
    from .merge import insert_if_absent

    if len(keys) != 1:
        raise ValueError("insert_if_absent_bloom: single-column key only")
    key = keys[0]
    # both branches share the dedup shuffle + probe subtree; within the
    # consumer's single action Spark's ReuseExchange evaluates it once
    probed = probe_bloom(
        new.dropDuplicates([key]), key, bloom, flag_col="__maybe"
    )
    definite_new = probed.filter(~F.col("__maybe")).drop("__maybe")
    suspects = probed.filter(F.col("__maybe")).drop("__maybe")
    merged = insert_if_absent(existing, suspects, [key])
    return merged.unionByName(definite_new, allowMissingColumns=True)
