"""Hashing-trick text vectorization (Weinberger et al. 2009).

The fixed-dimension featurizer for linear/quality models over unbounded
vocabularies — no vocabulary pass, no dictionary to ship: token t lands
in bucket ``md5_56(t) % dim`` with a ±1 sign from an independent md5
nibble (signed hashing keeps collision noise zero-mean), weights are
signed occurrence counts.

Everything is md5-based and integer-summed, so the vectors are
bit-identical across engines and partitionings — the ``hash_bucket``
convention (operators/sampling.py), with the same nibble-sum DuckDB
twin for the oracle side.

Output layout is SPARSE (id, bucket, weight) rows, not a dim-wide
array column: at 100 TB a dense array<dim> per document multiplies the
corpus by dim/avg_nnz for zeros, while the sparse triplet layout is
exactly what a distributed trainer or an aggregation join consumes, and
bucket-keyed partial aggregation makes per-bucket statistics (feature
frequencies, IDF-style reweighting) one map-side-combinable groupBy.

Plan shape: explode tokens → one hash per occurrence → groupBy
(id, bucket). One shuffle, keyed by (id, bucket); skew bounded by
tokens-per-document, never corpus size. No UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["hashed_features", "hashed_feature_stats"]


def _bucket56(tok: Column, dim: int) -> Column:
    """First 14 hex digits of md5(token) mod dim (56 bits — exact in
    int64; the hash_bucket convention)."""
    h = F.md5(tok)
    return F.conv(F.substring(h, 1, 14), 16, 10).cast("long") % dim


def _sign(tok: Column) -> Column:
    """±1 from the 15th md5 nibble (independent of the bucket bits)."""
    return F.when(
        F.substring(F.md5(tok), 15, 1) >= "8", F.lit(1)
    ).otherwise(F.lit(-1))


def hashed_features(
    df: DataFrame,
    text: str = "text",
    *,
    id_col: str = "doc_id",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Sparse hashed bag-of-words: (id_col, bucket INT, weight LONG),
    one row per non-zero bucket per document. ``signed=False`` gives
    plain counts (always > 0); signed mode can cancel to zero — such
    buckets are DROPPED (they are not observations, and keeping them
    would make the sparse layout partitioning-dependent in size only,
    values never)."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    tok = F.explode(tokens(text)).alias("tok")
    exploded = df.select(F.col(id_col), tok).filter(F.col("tok") != "")
    w = _sign(F.col("tok")) if signed else F.lit(1)
    out = (
        exploded.select(
            id_col,
            _bucket56(F.col("tok"), dim).cast("int").alias("bucket"),
            w.cast("long").alias("w"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("w").alias("weight"))
    )
    return out.filter(F.col("weight") != 0) if signed else out


def hashed_feature_stats(
    features: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document digest of a :func:`hashed_features` relation:
    (id, fh_nnz, fh_l1, fh_checksum) with ``fh_checksum = Σ bucket ·
    weight`` — three integers that pin the whole sparse vector for
    cross-engine verification without shipping it."""
    return features.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("fh_nnz"),
        F.sum(F.abs(F.col("weight"))).alias("fh_l1"),
        F.sum(F.col("bucket").cast("long") * F.col("weight")).alias(
            "fh_checksum"
        ),
    )
