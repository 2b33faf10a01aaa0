"""Driver-visible multimodal query: binary payload handling with a
mapInPandas decode (deterministic fake codec — see operators.multimodal)
composed with the built-in-only frame-sampling expansion, fully
oracle-checked (the fake decode is defined so DuckDB can recompute it
from the same bytes).

One relation covers the whole pipeline: every asset appears (outer
explode keeps zero-frame payloads as a NULL-frame row), decode metadata
(byte_len / n_frames / checksum) rides along each sampled frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_binary_payload,
    fake_decode_features,
    frame_sample,
)
from ..sources.tables import load_table
from . import QueryRegistry

REGISTRY = QueryRegistry()


@REGISTRY.register(
    "multimodal_decode_frames",
    oracle="""
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
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           width, height, byte_len, n_frames, checksum
    FROM sampled, UNNEST(frames) AS t(frame_idx)
    """,
)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = fake_decode_features(attach_binary_payload(docs))
    return frame_sample(
        decoded,
        every_nth=4,
        carry_cols=("byte_len", "n_frames", "checksum"),
        outer=True,
    )
