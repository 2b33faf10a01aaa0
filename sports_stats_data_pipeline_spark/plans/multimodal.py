"""Driver-visible multimodal queries: binary payload handling with a
mapInPandas decode (deterministic fake codec — see operators.multimodal)
plus a built-in-only frame-sampling expansion. Both fully oracle-checked:
the fake decode is defined so DuckDB can recompute it from the same bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary_payload,
    fake_decode_features,
    frame_sample,
)
from ..sources.tables import load_table
from . import QueryRegistry

REGISTRY = QueryRegistry()


@REGISTRY.register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           ascii(substr(text, 1, 1)) AS width,
           ascii(substr(text, 2, 1)) AS height,
           CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fake_decode_features(attach_binary_payload(docs))


@REGISTRY.register(
    "multimodal_frame_sample",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             ascii(substr(text, 1, 1)) AS width,
             ascii(substr(text, 2, 1)) AS height,
             CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, width, height
    FROM decoded, UNNEST(range(0, n_frames)) AS t(frame_idx)
    WHERE frame_idx % 4 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(fake_decode_features(attach_binary_payload(docs)))
