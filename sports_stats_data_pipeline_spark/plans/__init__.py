"""Named analytic queries.

Each plans module registers queries via :class:`QueryRegistry`: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
ANSI-SQL oracle string executed by DuckDB over the same parquet tables.
The driver compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded identically on both sides (floating-point
  summation order differs between engines — rounding removes last-bit noise
  without masking real errors);
- timestamps that we *compute* (window starts, buckets) are emitted as
  epoch-second BIGINTs to dodge ns-vs-us precision mismatch between parquet
  readers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryRegistry:
    queries: dict[str, QueryFn] = field(default_factory=dict)
    oracles: dict[str, str] = field(default_factory=dict)

    def register(self, name: str, oracle: str | None = None):
        """Decorator: register a query and (optionally) its DuckDB oracle."""

        def deco(fn: QueryFn) -> QueryFn:
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = oracle
            return fn

        return deco

    def merge(self, other: "QueryRegistry") -> None:
        dup = set(self.queries) & set(other.queries)
        if dup:
            raise ValueError(f"duplicate query names: {sorted(dup)}")
        self.queries.update(other.queries)
        self.oracles.update(other.oracles)


def all_registries() -> QueryRegistry:
    """Collect every plans module's registry into one."""
    from . import (
        advanced,
        corpus,
        documents,
        events,
        multimodal,
        quality,
        reference_queries,
        relational,
    )

    combined = QueryRegistry()
    for mod in (
        relational,
        advanced,
        events,
        documents,
        corpus,
        quality,
        multimodal,
        reference_queries,
    ):
        combined.merge(mod.REGISTRY)
    return combined
