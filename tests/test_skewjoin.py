"""Hot-key salted join: exact equivalence with the plain join (the whole
point — only the physical distribution may differ), plus the skew-bound
and determinism contracts."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.skewjoin import (
    hot_keys,
    skew_join,
)


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def skewed(spark):
    """One pathological key (5,000 rows), 50 normal keys (~10 rows each),
    plus fact keys absent from dim (left-null case) and dim keys absent
    from fact (dangling dim)."""
    fact = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(500).select(
        (F.col("id") % 50 + 1).alias("k"),
        (F.col("id") + 10_000).alias("payload"),
    )
    orphan = spark.range(20).select(
        (F.col("id") + 999_000).alias("k"),
        (F.col("id") + 20_000).alias("payload"),
    )
    fact = fact.unionByName(tail).unionByName(orphan)
    dim = spark.range(60).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("attr"),
    )
    return fact, dim


def test_hot_keys_finds_only_the_hot_key(spark, skewed):
    fact, _ = skewed
    assert [r["k"] for r in hot_keys(fact, ["k"], 100).collect()] == [0]
    assert hot_keys(fact, ["k"], 10_000).count() == 0


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_equals_plain_join(spark, skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how)
    salted = skew_join(
        fact, dim, ["k"], how=how, hot_threshold=100, salt_factor=8
    )
    assert _multiset(salted) == _multiset(plain)
    assert salted.columns == plain.columns


def test_all_cold_path_still_exact(spark, skewed):
    """A threshold nothing crosses routes everything through the plain
    cold join — same answer (the threshold is a perf dial only)."""
    fact, dim = skewed
    plain = fact.join(dim, ["k"], "inner")
    assert _multiset(
        skew_join(fact, dim, ["k"], hot_threshold=10**9)
    ) == _multiset(plain)


def test_salt_spreads_the_hot_key(spark, skewed):
    """The hot key's 5,000 fact rows must land on many distinct salts —
    the per-task bound drops to ~count/salt_factor."""
    fact, _ = skewed
    hot = F.broadcast(hot_keys(fact, ["k"], 100))
    fact_hot = fact.join(hot, ["k"], "left_semi")
    salted = fact_hot.withColumn(
        "s", F.pmod(F.xxhash64(*fact_hot.columns), F.lit(8)).cast("int")
    )
    per_salt = {
        r["s"]: r["n"]
        for r in salted.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_salt) == 8
    assert max(per_salt.values()) < 5000 * 0.5  # far below the unsalted task


def test_deterministic_across_runs(spark, skewed):
    fact, dim = skewed
    a = _multiset(skew_join(fact, dim, ["k"], hot_threshold=100))
    b = _multiset(skew_join(fact, dim, ["k"], hot_threshold=100))
    assert a == b


def test_rejects_dim_preserving_sides(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="swap the sides"):
        skew_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError, match="salt_factor"):
        skew_join(fact, dim, ["k"], salt_factor=0)


def test_map_typed_payload_does_not_crash(spark, skewed):
    """xxhash64 rejects MapType at analysis time; the salt must hash
    only the hashable columns so a map payload still joins exactly
    (ADVICE r3)."""
    fact, dim = skewed
    fact_m = fact.withColumn(
        "props", F.create_map(F.lit("a"), F.col("payload"))
    )
    got = skew_join(fact_m, dim, ["k"], hot_threshold=100).drop("props")
    plain = fact.join(dim, ["k"], "inner")
    assert _multiset(got) == _multiset(plain)


def test_degenerate_salt_warns(spark, skewed):
    """When no hashable non-key column exists, every hot-key row gets
    one salt — must warn loudly instead of silently not splitting."""
    import warnings as w

    fact, dim = skewed
    keys_only = fact.select("k").withColumn(
        "m", F.create_map(F.lit("x"), F.lit(1))
    )
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        skew_join(keys_only, dim, ["k"], hot_threshold=100).count()
    assert any("degenerates" in str(x.message) for x in rec)
