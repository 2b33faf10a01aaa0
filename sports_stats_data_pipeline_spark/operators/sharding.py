"""Token-budget shard packing: assign documents to contiguous training
shards so each shard holds ~``budget`` tokens — the step that turns a
curated corpus into fixed-size training shards.

Semantics (the standard contiguous packing): documents are laid out in
``id_col`` order; a document's shard is ``floor(start_offset / budget)``
where ``start_offset`` is the exclusive running token total before it.
Every shard except the last then carries at least ``budget`` tokens
minus one document's worth, and at most ``budget`` plus one document's
worth — the deterministic, restart-stable layout (append-only corpora
never re-shuffle existing shards' prefix).

Scale shape — the whole point of this module: the naive formulation is
``SUM(tokens) OVER (ORDER BY id)``, a GLOBAL ordered window = one
executor sorting 100 TB of rows through a single partition. Instead the
classic two-level distributed prefix sum:

1. order-preserving coarse buckets (``id // chunk`` — contiguous id
   ranges, so bucket order == id order);
2. per-bucket token sums (one hash aggregate), then the exclusive
   prefix over BUCKETS — a window over ``n_buckets`` rows, trivially
   small;
3. broadcast the bucket offsets back and take the intra-bucket running
   sum (window partitioned BY bucket — every partition works in
   parallel).

Equivalent output to the global window (pinned against a DuckDB global
cumsum in tests), with the global sort replaced by one tiny window and
one partitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_token_shards(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 64,
    max_id: int | None = None,
) -> DataFrame:
    """Add ``start_offset`` and ``shard`` columns (see module docstring).

    ``id_col`` must be unique and non-negative; shard layout follows
    ascending ``id_col`` order. ``budget`` is in tokens.

    ``max_id`` — optional pre-computed ``max(id_col)``: the bucket-width
    decision is the operator's ONE driver-side action, and a caller
    laying out the same relation more than once (shards + sequence
    packing over one id space) can pay that job once and share it. Only
    the bucketing granularity depends on it, not the output: any value
    >= the true max yields identical offsets (buckets are contiguous id
    ranges either way), so a caller-supplied stale-but-larger bound is
    safe.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_id is None:
        max_id = docs.agg(F.max(id_col)).first()[0]
    if max_id is None:
        return docs.select(
            "*",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("shard"),
        ).limit(0)
    chunk = max(1, (int(max_id) + n_buckets) // n_buckets)

    bucketed = docs.withColumn(
        "__bucket", (F.col(id_col) / chunk).cast("long")
    )
    # exclusive prefix per bucket: tiny relation (n_buckets rows), the
    # single-partition window here is over buckets, not documents.
    bw = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(token_col).alias("__bucket_tokens"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__bucket_tokens").over(bw), F.lit(0))
            .cast("long")
            .alias("__bucket_offset"),
        )
    )
    # intra-bucket exclusive running sum — parallel across buckets.
    iw = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "start_offset",
            (
                F.col("__bucket_offset")
                + F.coalesce(F.sum(token_col).over(iw), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "shard", F.floor(F.col("start_offset") / budget).cast("long")
        )
        .drop("__bucket", "__bucket_offset")
    )


def pack_training_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 64,
    max_id: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing: lay documents out contiguously in
    ``id_col`` order and cut the token stream into fixed ``seq_len``
    training sequences (documents spanning a boundary are split — the
    standard concat-and-cut used to build LM training batches, with the
    segment map preserved so loss masking / doc-boundary attention can
    be applied downstream).

    Output: one row per (document, sequence) SEGMENT — all input
    columns plus ``start_offset`` (the doc's global token offset),
    ``seq_id``, and ``[doc_from, doc_to)`` / ``seq_from``: tokens
    ``doc_from..doc_to`` of the document occupy positions ``seq_from..
    seq_from + (doc_to - doc_from)`` of sequence ``seq_id``.

    Scale shape: global offsets come from the two-level prefix sum of
    :func:`assign_token_shards` (no global sort); the segment fan-out is
    a ``sequence``+``explode`` over each document's touched sequence
    range — at most ``ceil(n_tokens/seq_len) + 1`` segments per doc, so
    output size is ~``total_tokens/seq_len + n_docs`` rows regardless
    of skew. Deterministic and restart-stable: appending documents with
    larger ids never re-packs existing sequences.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    laid = assign_token_shards(
        docs, budget=seq_len, id_col=id_col, token_col=token_col,
        n_buckets=n_buckets, max_id=max_id,
    ).drop("shard")
    start, n = F.col("start_offset"), F.col(token_col)
    seq_lo = F.floor(start / seq_len).cast("long")
    seq_hi = F.floor((start + n - 1) / seq_len).cast("long")
    seg = laid.filter(n > 0).withColumn(
        "seq_id", F.explode(F.sequence(seq_lo, seq_hi))
    )
    sid = F.col("seq_id")
    return (
        seg.withColumn(
            "doc_from",
            F.greatest(F.lit(0).cast("long"), sid * seq_len - start),
        )
        .withColumn(
            "doc_to", F.least(n.cast("long"), (sid + 1) * seq_len - start)
        )
        .withColumn(
            "seq_from",
            F.greatest(F.lit(0).cast("long"), start - sid * seq_len),
        )
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_fn=None,
) -> DataFrame:
    """Deterministic global training-epoch shuffle: add ``epoch_pos``, a
    dense 0..n-1 position in seeded-hash order (the GPT-style "shuffle
    the corpus differently each epoch, identically on every re-run").

    Position = rank of ``hash_fn(epoch, id)`` (ties broken by id). The
    default hash is ``xxhash64(epoch, id)`` — the fast engine-native
    choice; pass :func:`md5_epoch_hash` for the cross-engine variant a
    DuckDB/portable pipeline can reproduce bit-for-bit (the twin the
    tests pin), or any Column-producing callable ``(epoch, id_col) ->
    non-negative-ordered BIGINT``. The naive formulation is
    ``row_number() OVER (ORDER BY hash)`` — the same single-executor
    global sort this module exists to avoid — so it reuses the two-level
    shape: the hash's top bits form order-preserving coarse buckets
    (hash order == (bucket, in-bucket hash) order), bucket counts take
    the exclusive prefix over ``n_buckets`` rows, and ``row_number``
    runs partitioned BY bucket. Feed the result to
    :func:`assign_token_shards` / :func:`pack_training_sequences` with
    ``id_col="epoch_pos"`` to pack the shuffled order into shards.

    ``n_buckets`` must be a power of two (bucket = unsigned top bits).
    """
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"n_buckets must be a power of two, got {n_buckets}"
        )
    shift = 64 - (n_buckets.bit_length() - 1)
    # unsigned top bits: bucket order is unsigned-hash order, and within
    # a bucket every hash shares the sign bit, so signed in-bucket order
    # matches — (bucket asc, hash asc, id asc) is a total order.
    h = (hash_fn or (lambda e, c: F.xxhash64(F.lit(int(e)), F.col(c))))(
        epoch, id_col
    )
    bucketed = docs.withColumn("__h", h).withColumn(
        "__bucket",
        F.shiftrightunsigned(F.col("__h"), shift) if shift < 64
        else F.lit(0).cast("long"),
    )
    bw = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("__bucket")
        .agg(F.count("*").alias("__n"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__n").over(bw), F.lit(0))
            .cast("long")
            .alias("__bucket_offset"),
        )
    )
    iw = Window.partitionBy("__bucket").orderBy("__h", id_col)
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "epoch_pos",
            (
                F.col("__bucket_offset") + F.row_number().over(iw) - 1
            ).cast("long"),
        )
        .drop("__h", "__bucket", "__bucket_offset")
    )


def md5_epoch_hash(epoch: int, id_col: str):
    """Cross-engine epoch hash for :func:`epoch_shuffle`: the first 15
    hex chars (60 bits, always non-negative — signed order == unsigned
    order) of ``md5('<epoch>:<id>')``. Identical in DuckDB as
    ``('0x' || substr(md5(epoch || ':' || id), 1, 15))::BIGINT`` — the
    portability trade is one md5 per row versus xxhash64's near-free
    integer mix (cf. the MinHash hash-family note, NOTES.md)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(int(epoch))), F.col(id_col))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
