"""Token-window document chunking — the context-window prep step of an
LLM training-data pipeline (fixed-size chunks with overlap/stride).

Pure built-in expressions: tokenize once, generate the start offsets with
``sequence``, slice each window with ``slice``, fan out with
``posexplode``. No shuffle is introduced — chunking is a per-row map with
an explode fan-out of ``ceil(n_tokens / stride)``, so at 100 TB it
pipelines inside the scan stage; balance/repartitioning of the exploded
output is the *downstream* writer's concern (e.g. the sharding
operator's token-budget packing consumes exactly this shape).

Determinism: chunk boundaries depend only on the token sequence and the
(chunk_tokens, stride) parameters — stable across partitionings, retries,
and engines (the DuckDB twin in tests/test_chunking.py replays the same
slicing with ``range`` + list slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output grain: one row per (document, chunk) with columns
    ``(id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text)``.
    ``chunk_idx`` is the 0-based window ordinal; ``start_token`` its
    0-based token offset (= ``chunk_idx * stride``); consecutive chunks
    overlap by ``chunk_tokens - stride`` tokens.

    ``stride <= chunk_tokens`` is required (a larger stride would drop
    tokens between windows); ``stride == chunk_tokens`` gives exact
    non-overlapping partitioning of the token sequence.
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) would "
            "drop tokens between consecutive windows"
        )
    from ..functions.text import let1

    toks = tokens(text_col)
    # let1-bound split (one regex split per row — see functions.text.
    # let1); an index lambda would re-split per window. The window
    # count + texts come out as one struct so the bind covers both.
    # start offsets 0, stride, 2*stride, ... < n (n >= 1 always: the
    # whitespace tokenizer yields [''] for an empty string).
    win = let1(
        toks,
        lambda t: F.struct(
            F.size(t).alias("n"),
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 1, F.lit(stride)),
                # slice() is 1-based; length past the end truncates.
                lambda s: F.concat_ws(" ", F.slice(t, s + 1, chunk_tokens)),
            ).alias("texts"),
        ),
    )
    # staged select: __w is expensive and referenced twice below, so
    # CollapseProject keeps it materialized (one evaluation per row)
    # and Generate carries it past the explode as a plain column.
    staged = docs.select(F.col(id_col), win.alias("__w"))
    exploded = staged.select(
        F.col(id_col),
        F.col("__w.n").alias("__n"),
        F.posexplode("__w.texts").alias("chunk_idx", "chunk_text"),
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * stride).cast("long").alias("start_token"),
        F.least(
            F.col("__n") - F.col("chunk_idx") * stride, F.lit(chunk_tokens)
        )
        .cast("long")
        .alias("n_chunk_tokens"),
        "chunk_text",
    )
