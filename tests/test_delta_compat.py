"""operators.delta_compat — Delta MERGE/OPTIMIZE semantics on the
parquet fallback (delta-spark absent in this container; the Delta route
is exercised when the package + session extension are present)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.delta_compat import (
    delta_available,
    insert_absent,
    optimize,
    upsert,
)
from sports_stats_data_pipeline_spark.operators.maintenance import (
    parquet_file_count,
)


def _read(spark, path):
    return {
        r["k"]: (r["v"], r["ts"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_last_writer_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, ts long"
    )
    upsert(spark, path, base, ["k"])
    # batch with an intra-batch duplicate: max ts must win; key 3 inserts
    upd = spark.createDataFrame(
        [(2, "B1", 20), (2, "B2", 30), (3, "c", 20)],
        "k long, v string, ts long",
    )
    upsert(spark, path, upd, ["k"], order_col="ts")
    assert _read(spark, path) == {
        1: ("a", 10),
        2: ("B2", 30),
        3: ("c", 20),
    }


def test_insert_absent_first_writer_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    insert_absent(
        spark,
        path,
        spark.createDataFrame([(1, "a", 1)], "k long, v string, ts long"),
        ["k"],
    )
    insert_absent(
        spark,
        path,
        spark.createDataFrame(
            [(1, "A", 2), (2, "b", 2)], "k long, v string, ts long"
        ),
        ["k"],
    )
    assert _read(spark, path) == {1: ("a", 1), 2: ("b", 2)}


def test_insert_absent_intra_batch_order_col(spark, tmp_path):
    """With ``order_col``, duplicate keys WITHIN a batch resolve
    deterministically to the min-order row (first-writer-wins extended
    into the batch), not to an arbitrary partition-order survivor."""
    path = str(tmp_path / "t")
    batch = spark.createDataFrame(
        [(1, "late", 5), (1, "early", 2), (2, "only", 9)],
        "k long, v string, ts long",
    ).repartition(4)
    insert_absent(spark, path, batch, ["k"], order_col="ts")
    assert _read(spark, path) == {1: ("early", 2), 2: ("only", 9)}
    # keys already present stay untouched on the next batch
    insert_absent(
        spark,
        path,
        spark.createDataFrame([(1, "x", 1)], "k long, v string, ts long"),
        ["k"],
        order_col="ts",
    )
    assert _read(spark, path) == {1: ("early", 2), 2: ("only", 9)}


def test_optimize_compacts(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 1000).repartition(16).withColumn(
        "k", F.col("id")
    ).write.parquet(path)
    assert parquet_file_count(path) >= 16
    optimize(spark, path, target_files=2)
    assert parquet_file_count(path) <= 2
    assert spark.read.parquet(path).count() == 1000


def test_delta_unavailable_is_detected(spark):
    # this container has no delta-spark; when one is installed AND the
    # session carries the extension, the merge paths route to DeltaTable
    try:
        import delta  # noqa: F401

        installed = True
    except ImportError:
        installed = False
    if not installed:
        assert delta_available(spark) is False


def test_null_keys_match_null_safely_like_delta(spark, tmp_path):
    """Delta's MERGE condition is t.k <=> s.k, so NULL-keyed rows are
    replaced (upsert) / skipped (insert_absent). The parquet fallback
    must agree (ADVICE r3: plain-equality anti joins duplicated them)."""
    up = str(tmp_path / "up")
    base = spark.createDataFrame(
        [(None, "old", 1), (1, "a", 1)], "k long, v string, ts long"
    )
    base.write.parquet(up)
    upsert(
        spark,
        up,
        spark.createDataFrame([(None, "new", 2)], "k long, v string, ts long"),
        ["k"],
        order_col="ts",
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(up).collect()}
    assert got == {None: "new", 1: "a"}  # replaced, not duplicated

    ia = str(tmp_path / "ia")
    base.write.parquet(ia)
    insert_absent(
        spark,
        ia,
        spark.createDataFrame(
            [(None, "skipme", 2), (2, "b", 2)], "k long, v string, ts long"
        ),
        ["k"],
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(ia).collect()}
    assert got == {None: "old", 1: "a", 2: "b"}  # NULL key skipped


def test_null_safe_join_survives_s_prefixed_columns(spark, tmp_path):
    """A table that itself carries a __s_<key> column must not make the
    null-safe merge condition ambiguous."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 7)], "k long, v string, __s_k long"
    ).write.parquet(path)
    upsert(
        spark,
        path,
        spark.createDataFrame([(1, "b", 8)], "k long, v string, __s_k long"),
        ["k"],
    )
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0]["v"] == "b"
