"""Driver-visible multimodal query: binary payload handling with a
mapInPandas decode (deterministic fake codec — see operators.multimodal)
composed with the built-in-only frame-sampling expansion, fully
oracle-checked (the fake decode is defined so DuckDB can recompute it
from the same bytes).

Two families in one slot since round 4:
- 'fake': the original pipeline — every asset appears (outer explode
  keeps zero-frame payloads as a NULL-frame row), decode metadata
  (byte_len / n_frames / checksum) rides along each sampled frame.
- 'png': the REAL codec driver-gated end-to-end — grayscale grids are
  synthesized in closed form from doc_id, encoded to genuine PNG bytes
  (operators.png.encode_png, the scanline filter type varying with
  doc_id so all five filters execute in every driver run), decoded
  back through real_decode_pixels(backend="pure"), and summarized as
  (width, height, pixel_sum, first/last pixel). The oracle recomputes
  the summary from the same closed form, so a codec bug anywhere in
  filter/unfilter/IDAT handling flips the hash.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary_payload,
    fake_decode_features,
    frame_sample,
    real_decode_pixels,
)
from ..sources.tables import load_table
from . import QueryRegistry

REGISTRY = QueryRegistry()

#: closed-form PNG fixtures: doc_id < _PNG_IDS, w = 2 + id%5,
#: h = 2 + id%3, pixels[i] = (id*7 + i*11) % 256, filter = id%5.
_PNG_IDS = 40


def _png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _PNG_IDS)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.png import encode_png

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 2 + d % 5, 2 + d % 3
                px = [(d * 7 + i * 11) % 256 for i in range(w * h)]
                rows.append(
                    (d, bytearray(encode_png(px, width=w, filter_type=d % 5)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payload = ids.mapInPandas(gen, schema="doc_id long, payload binary")
    decoded = real_decode_pixels(payload, max_side=64, backend="pure")
    px = F.col("pixels")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.aggregate(
            px, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("pixel_sum"),
        F.get(px, 0).alias("px_first"),
        F.get(px, F.size(px) - 1).alias("px_last"),
    )


@REGISTRY.register(
    "multimodal_decode_frames",
    oracle=f"""
    WITH decoded AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
             ascii(substr(text, 1, 1)) AS width,
             ascii(substr(text, 2, 1)) AS height,
             CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames,
             md5(text) AS checksum
      FROM documents
    ), sampled AS (
      SELECT doc_id, byte_len, width, height, n_frames, checksum,
             CASE WHEN n_frames > 0
                  THEN list_filter(range(0, n_frames), i -> i % 4 = 0)
                  ELSE [NULL] END AS frames
      FROM decoded
    )
    SELECT 'fake' AS family, doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           width, height, byte_len, n_frames, checksum,
           CAST(NULL AS BIGINT) AS pixel_sum,
           CAST(NULL AS INTEGER) AS px_first,
           CAST(NULL AS INTEGER) AS px_last
    FROM sampled, UNNEST(frames) AS t(frame_idx)
    UNION ALL
    SELECT 'png', doc_id, CAST(NULL AS INTEGER),
           CAST(w AS INTEGER), CAST(h AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS VARCHAR),
           CAST(list_aggregate(list_transform(range(0, w * h),
                i -> (doc_id * 7 + i * 11) % 256), 'sum') AS BIGINT),
           CAST(doc_id * 7 % 256 AS INTEGER),
           CAST((doc_id * 7 + (w * h - 1) * 11) % 256 AS INTEGER)
    FROM (SELECT doc_id, 2 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
          FROM documents WHERE doc_id < {_PNG_IDS})
    """,
)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = fake_decode_features(attach_binary_payload(docs))
    null_i = F.lit(None).cast("int")
    fake = frame_sample(
        decoded,
        every_nth=4,
        carry_cols=("byte_len", "n_frames", "checksum"),
        outer=True,
    ).select(
        F.lit("fake").alias("family"),
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "byte_len",
        "n_frames",
        "checksum",
        F.lit(None).cast("long").alias("pixel_sum"),
        null_i.alias("px_first"),
        null_i.alias("px_last"),
    )
    png = _png_roundtrip(spark, sf_dir).select(
        F.lit("png").alias("family"),
        "doc_id",
        null_i.alias("frame_idx"),
        "width",
        "height",
        null_i.alias("byte_len"),
        null_i.alias("n_frames"),
        F.lit(None).cast("string").alias("checksum"),
        "pixel_sum",
        "px_first",
        "px_last",
    )
    return fake.unionByName(png)
