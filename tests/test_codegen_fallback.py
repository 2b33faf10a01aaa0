"""Whole-stage-codegen compile failures must never ship silently.

Spark recovers from a Janino compile error by falling back to the
interpreted path (``spark.sql.codegen.fallback=true`` by default), so a
query whose generated code blows the 64 KB method limit still returns
correct rows — it just runs several times slower and logs an ERROR
nobody reads.  At 100 TB that silent fallback is a real regression:
the whole point of keeping expressions JVM-side is whole-stage codegen.

This net flips ``spark.sql.codegen.fallback`` off for the session and
executes every registered driver query, so any plan whose fused stage
stops compiling fails the suite instead of limping through interpreted.

Found the hard way: an inferred ``isnotnull(domain)`` constraint in
url_domain_curation was pushed beneath its Projects, inlining the whole
url->host->domain regexp chain into a ~25 KB Filter on both sides of a
self-join — compile failure, interpreted fallback, zero test signal.

Compile success is plan-shaped, not data-shaped, so sf0.001 gives the
same coverage as the driver's sf0.01 at a fraction of the wall-clock.
"""

from __future__ import annotations

import pytest

from sports_stats_data_pipeline_spark.plans import all_registries

from .conftest import SF_SMOKE

_REG = all_registries()


@pytest.fixture(scope="module")
def strict_codegen(spark):
    """Session-scoped Spark with interpreted fallback disabled.

    ``spark.sql.codegen.fallback`` is a runtime SQLConf, so it can be
    flipped on the shared session and restored afterwards — no second
    JVM needed.
    """
    key = "spark.sql.codegen.fallback"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield spark
    spark.conf.set(key, prev)


@pytest.mark.parametrize("name", sorted(_REG.queries))
def test_driver_query_compiles(strict_codegen, name):
    # .collect() (not .count()) so every fused stage in the final plan
    # actually generates, compiles, and runs — count() can prune whole
    # subtrees (e.g. project-only columns) before they ever compile.
    _REG.queries[name](strict_codegen, SF_SMOKE).collect()
