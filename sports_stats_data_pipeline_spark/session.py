"""SparkSession factory.

Defaults target the harness environment (local[N], single JVM) but every
setting is chosen to also be the right call on a 1000-executor cluster
reading 100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace hand-tuned partition counts.
- Arrow on: every pandas UDF / mapInPandas crossing is vectorized.
- ``spark.sql.shuffle.partitions`` is only the AQE *initial* value; AQE
  coalesces it down at small SF and fans it out under skew at large SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sports-stats-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert sort-merge → broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size when coalescing instead of
        # maximizing parallelism — the Spark-documented recommendation
        # ("it's recommended to set this config to false"); the default
        # true keeps legacy behavior and floods tiny post-shuffle stages
        # with near-empty tasks (measured: −8.5% on the sf0.1 headline;
        # at cluster scale the advisory size is the knob that keeps
        # reducers at healthy input sizes).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        # With parallelismFirst=false the advisory size IS the coalesce
        # target, and Spark's 64m default is tuned for I/O-bound
        # reducers: on this engine's expression-dense stages (hash
        # forests, HOF folds, LSH banding) a 64m target coalesces most
        # post-shuffle stages of a sub-GB input to ONE task and
        # serializes the CPU work. 4m keeps those stages parallel while
        # still bounding reducer input (measured sweep on the sf0.1
        # headline: 64m 10.4s / 16m 9.1s / 4m 8.95s / 1m 8.7s — the
        # sub-4m tail is scheduler noise). Override per deployment:
        # I/O-heavy ETL on a large cluster wants this back at 64m+.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "4m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ObjectHashAggregate (collect_list/hll/sketch aggregates) falls
        # back to SORT-based aggregation after only 128 distinct keys
        # per task — a full per-partition sort whenever group
        # cardinality is non-trivial, which is every sketch-carrying
        # aggregate in this engine (quantile/HLL mart measures, CMS,
        # Bloom shards, pooled vectors). The buffers here are small
        # (bounded sketch entries), so a larger in-memory map is the
        # right trade at any scale; the per-task bound remains
        # (keys-per-task shrinks as partitions grow). Measured round
        # 13: the mart's 5-measure delta aggregate 0.78 -> 0.60 s at
        # sf0.1. Value-neutral: sort-based and hash aggregation see the
        # same per-group input order (sort is by key only), and every
        # order-sensitive consumer in this codebase sorts its arrays.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OBJAGG_FALLBACK", "65536"),
        )
        # Spark's 10m broadcast bound dates to small-heap executors; on
        # multi-GB executors a <=32m dim table is cheap to ship and
        # saves a full shuffle of the fact side (measured at sf0.1:
        # q5 1.36->1.08s, q3 0.85->0.72s, topk 0.72->0.63s — the
        # dims-broadcast plan is also the right 100 TB shape: customer/
        # supplier/nation/region stay broadcast even at SF100k while
        # lineitem/orders shuffle). AQE still demotes a broadcast whose
        # runtime size exceeds the bound.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", "32m"),
        )
        # Arrow for all Python<->JVM data movement (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Session-local timezone pinned to UTC so timestamp semantics match
        # the DuckDB oracle regardless of host timezone.
        .config("spark.sql.session.timeZone", "UTC")
        # The events table stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as int64 nanos and convert in the loader
        # (sources.tables) — matches DuckDB's ns->us truncation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming state store: RocksDB (disk-backed, off-heap working
        # set, changelog + snapshot checkpointing) instead of the
        # default HDFSBackedStateStoreProvider, which keeps EVERY
        # store's full contents as JVM-heap hashmaps — the one
        # streaming component that cannot survive 100 TB-scale state
        # (stream-stream join + dedup state grows with the watermark
        # horizon, not the batch). RocksDB bounds heap by spilling to
        # local SSD and is the production-documented choice for large
        # state. Overridable per deployment via env.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "SPARK_GRAFT_STATE_STORE",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            ),
        )
        # managed-table location for bucketed materializations (static
        # conf — must be set before the session exists).
        .config("spark.sql.warehouse.dir", "/tmp/spark-graft-warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Override HOOK only: the '1g' fallback equals Spark's built-in
        # default, so this line changes nothing by itself. The relief
        # for scale-replica referee collections (toPandas of
        # multi-million-row comparison frames; the 100x streaming slot
        # measured 1.03 GiB of task results) comes from
        # tools/run_scale_validation.py exporting
        # SPARK_GRAFT_MAX_RESULT_SIZE=8g in the sampled regime. The
        # engine's own plans never collect unbounded relations.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT_SIZE", "1g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
