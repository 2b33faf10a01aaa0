"""operators.multimodal pixel decode + nearest-neighbor resize: shape
contracts, a hand-computed gather anchor, identity resize, determinism
under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    fake_decode_pixels,
    resize_nearest,
)
from sports_stats_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _pixels(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return fake_decode_pixels(attach_binary_payload(docs))


def test_decode_shape_contract(spark):
    px = _pixels(spark).persist()
    assert px.count() == 500
    bad = px.filter(
        (F.size("pixels") != F.col("width") * F.col("height"))
        | (F.col("width") < 2)
        | (F.col("height") < 2)
    )
    assert bad.count() == 0
    px.unpersist()


def test_resize_shapes_and_identity(spark):
    px = _pixels(spark)
    out = resize_nearest(px, 8, 6).persist()
    assert out.count() == 500
    assert (
        out.filter(
            (F.col("width") != 8)
            | (F.col("height") != 6)
            | (F.size("pixels") != 48)
        ).count()
        == 0
    )
    out.unpersist()
    # identity: resizing to the source dims returns the source pixels
    one = px.filter(F.col("doc_id") == 0).first()
    ident = (
        resize_nearest(px.filter(F.col("doc_id") == 0), one["width"], one["height"])
        .first()
    )
    assert list(ident["pixels"]) == list(one["pixels"])


def test_hand_computed_gather_anchor(spark):
    # 4x2 grid -> 2x1: rows ys = [0], cols xs = [0, 2]
    df = spark.createDataFrame(
        [(1, 4, 2, [10, 11, 12, 13, 20, 21, 22, 23])],
        "doc_id long, width int, height int, pixels array<int>",
    )
    row = resize_nearest(df, 2, 1).first()
    assert list(row["pixels"]) == [10, 12]
    with pytest.raises(ValueError):
        resize_nearest(df, 0, 1)


def test_partition_invariance(spark):
    px = _pixels(spark)
    a = {
        r["doc_id"]: list(r["pixels"])
        for r in resize_nearest(px, 5, 5).collect()
    }
    b = {
        r["doc_id"]: list(r["pixels"])
        for r in resize_nearest(px.repartition(7), 5, 5).collect()
    }
    assert a == b


def test_real_decode_stub_raises_without_pillow(spark):
    """Without pillow the real-codec path must fail eagerly on the
    driver (documented stub), not mid-job on an executor."""
    from sports_stats_data_pipeline_spark.operators import multimodal as mm

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    payload = attach_binary_payload(docs)
    if mm.pil_available():
        pytest.skip("pillow installed; covered by the real-decode test")
    with pytest.raises(NotImplementedError):
        mm.real_decode_pixels(payload)


def test_real_decode_pixels_with_pillow(spark):
    """When pillow IS installed: PNG payloads round-trip through the
    real decode into the same PIXELS_SCHEMA contract as the fake path
    (skips cleanly otherwise)."""
    from sports_stats_data_pipeline_spark.operators import multimodal as mm

    PIL = pytest.importorskip("PIL.Image")
    import io

    def png_bytes(w, h, seed):
        img = PIL.new("L", (w, h))
        img.putdata([(seed + i * 7) % 256 for i in range(w * h)])
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, bytearray(png_bytes(4, 3, 10))),
        (2, bytearray(png_bytes(200, 100, 42))),  # > max_side: thumbnailed
        (3, bytearray(b"not an image")),  # undecodable: dropped
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, payload binary")
    out = mm.real_decode_pixels(df, max_side=64).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    r1 = out[0]
    assert (r1["width"], r1["height"]) == (4, 3)
    assert r1["pixels"] == [(10 + i * 7) % 256 for i in range(12)]
    r2 = out[1]
    assert max(r2["width"], r2["height"]) <= 64
    assert len(r2["pixels"]) == r2["width"] * r2["height"]
