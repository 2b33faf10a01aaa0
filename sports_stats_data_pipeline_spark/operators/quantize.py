"""Int8 embedding quantization + quantized similarity search — the
memory side of the ANN family (operators/similarity.py covers the
compute side). A 100 TB float32 embedding corpus is 4× smaller as int8
codes with one scale per vector; IVF/LSH candidate generation then runs
against codes and only the final rerank touches floats (the standard
faiss-style SQ8 layout).

Determinism: quantization is bit-exact across engines — float inputs
widen to double (exact), the per-vector scale is ``max(|x|)/127``
(order-independent max, exact IEEE divide), and the code is
``floor(x/scale + 0.5)`` (explicit half-up; NOT engine ``round()``,
whose half-even/half-up convention differs between engines). Quantized
dot products and squared norms are exact integer arithmetic, so
approximate-cosine scores are deterministic doubles; tests emit them in
floored micro-units.

Everything is built-in higher-order functions (transform / zip_with /
aggregate) — JVM-side codegen, no Python, no shuffle beyond the final
top-k's TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double

__all__ = [
    "quantize_embeddings",
    "dequantize",
    "quantized_cosine_topk",
    "quantized_ivf_topk",
]

_QMAX = 127  # symmetric int8 code range [-127, 127]


def _scale(vec: Column) -> Column:
    """Per-vector quantization scale max(|x|)/127; all-zero vectors get
    scale 1.0 so their code is all-zero rather than NaN."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    return F.when(amax > 0.0, amax / F.lit(float(_QMAX))).otherwise(
        F.lit(1.0)
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Append ``{out_prefix}vec`` (array<int> codes in [-127, 127]) and
    ``{out_prefix}scale`` (double) columns; drops the float column —
    the point is the 4× smaller representation."""
    v = as_double(F.col(vec_col))
    s = _scale(v)
    codes = F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("int"))
    return df.withColumn(f"{out_prefix}scale", s).withColumn(
        f"{out_prefix}vec", codes
    ).drop(vec_col)


def dequantize(codes: Column, scale: Column) -> Column:
    """array<double> reconstruction: code * scale (max abs error is
    scale/2 per element — pinned in tests)."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine_topk(
    corpus_q: DataFrame,
    queries_q: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k under the QUANTIZED cosine: the approximate
    score faiss calls asymmetric-symmetric SQ distance, computed wholly
    in integer dot products scaled back by the two vectors' scales.

    Inputs carry ``qvec``/``qscale`` (from :func:`quantize_embeddings`).
    The query side broadcasts; one corpus scan; per-query top-k by
    (score desc, id asc) via row_number — identical topology to the
    float brute-force baseline (plans/documents.py embedding_cosine_topk)
    so the recall comparison in tests isolates the quantization error.
    """
    from pyspark.sql import Window

    q = queries_q.select(
        F.col(id_col).alias(query_id_col),
        F.col("qvec").alias("__qv"),
        F.col("qscale").alias("__qs"),
    )
    dot_int = _int_dot(F.col("__qv"), F.col("qvec"))
    na = _int_dot(F.col("__qv"), F.col("__qv"))
    nb = _int_dot(F.col("qvec"), F.col("qvec"))
    score = (
        dot_int.cast("double")
        / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
    )
    scored = (
        corpus_q.join(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.floor(F.lit(1e6) * score).cast("long").alias("qcos_micro"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qcos_micro").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def quantized_ivf_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 3,
    n_cells: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full 100 TB ANN layout: k-means IVF cells (operators.kmeans)
    over int8 codes — the index stores 4× smaller vectors AND the query
    touches only the probed cells' members.

    Index build (ingest-time at scale — both tables written, partitioned
    by cell): float vectors → cell assignment; float vectors → int8
    codes. Query: rank centroids with the float query vector (exact,
    the standard faiss layout — queries are few), probe ``n_probe``
    cells, score members with the exact-integer quantized cosine.

    ``n_probe >= n_cells`` degenerates to quantized brute force —
    tests pin equality with :func:`quantized_cosine_topk` there, so the
    IVF path inherits the quantization-only error bound.
    """
    from ..functions.vectors import as_double
    from .kmeans import kmeans_fit_assign
    from pyspark.sql import Window

    assigned, centroids = kmeans_fit_assign(
        embeddings, k=n_cells, iters=kmeans_iters, id_col=id_col,
        vec_col=vec_col,
    )  # both come back persisted + materialized; released below
    codes = quantize_embeddings(embeddings, vec_col)
    corpus = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("cq"),
    ).join(
        assigned.select(F.col(id_col).alias("neighbor_id"), "cell"),
        "neighbor_id",
    )

    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    )
    qcodes = codes.join(
        embeddings.filter(query_filter).select(id_col), id_col
    ).select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qq"))
    cw = Window.partitionBy("query_id").orderBy(F.col("cdist"), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cdist",
            F.aggregate(
                F.zip_with(
                    F.col("qv"), F.col("centroid"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "cell")
        .join(qcodes, "query_id")
    )
    dot_int = _int_dot(F.col("qq"), F.col("cq"))
    na = _int_dot(F.col("qq"), F.col("qq"))
    nb = _int_dot(F.col("cq"), F.col("cq"))
    score = (
        dot_int.cast("double")
        / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos_micro").desc(), F.col("neighbor_id")
    )
    out = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.lit(1e6) * score).cast("long").alias("qcos_micro"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # the result is k rows per query — tiny next to the index. Cut it
    # loose eagerly (localCheckpoint blocks are GC-scoped, unlike
    # CacheManager entries) and release the kmeans caches so repeated
    # calls in a long-lived session don't accumulate cached relations.
    out = out.localCheckpoint(eager=True)
    assigned.unpersist()
    centroids.unpersist()
    return out
