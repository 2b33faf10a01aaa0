"""SemDeDup-style semantic deduplication over an embedding column.

Exact dedup catches byte-identical documents; MinHash/SimHash catch
lexical near-duplicates; *semantic* dedup (Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
2023) removes documents whose EMBEDDINGS are nearly identical even when
their surface text differs (re-writes, translations, templated spins).
The published recipe is the one implemented here:

1. cluster all embeddings with a k-means coarse quantizer
   (operators.kmeans — deterministic Lloyd);
2. compare pairs only WITHIN a cluster (the quadratic step is bounded
   by cluster size, never corpus size);
3. treat pairs above a cosine threshold as semantic duplicates and keep
   one deterministic representative per duplicate group.

Group resolution uses operators.components hash-min label propagation —
semantic duplication is transitive in intent (A~B and B~C ⇒ keep one of
{A,B,C}), exactly like the MinHash cluster query
(plans.documents.neardup_doc_clusters). The survivor is the group's
minimum id (first-wins, cf. reference fighters_scraper.py:150).

Scale design (the knobs that decide whether this survives 100 TB):
- The within-cell self-join is the only super-linear stage and is
  bounded by Σ cell² — pick ``n_cells`` so the expected cell holds
  ~thousands of vectors. Cells larger than ``cell_cap`` are SKIPPED
  (their members pass through unflagged, the family-wide skew-guard
  contract of plans.documents._skip_hot): a degenerate corpus whose
  vectors all collapse into one cell degrades to no-op, never to an
  O(n²) join. At the paper's scale this step re-clusters giant cells
  instead; the cap keeps the bound explicit.
- Cosine is compared in integer micro-units (``floor(cos * 1e6)``) so
  the keep/drop decision is partition-order invariant (double sums are
  not associative; a boundary score must not flip across runs).
- Nothing driver-side: clustering is the kmeans module's bounded
  shuffle, edges shuffle by cell, components shuffle by label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine
from .components import connected_components
from .kmeans import kmeans_fit_assign


def semantic_dedup(
    embeddings: DataFrame,
    n_cells: int = 8,
    threshold_micro: int = 950_000,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 4096,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Flag semantic duplicates; returns one row per input vector:
    ``(id_col, cell, group_id, n_members, keep)`` where ``group_id`` is
    the duplicate group's minimum id, ``n_members`` its size (1 for
    non-duplicated vectors), and ``keep`` marks the survivor.

    ``centroids`` — optional pre-trained coarse quantizer as a
    ``(cell int, centroid array<double>)`` relation; when supplied the
    k-means fit is skipped (``n_cells``/``kmeans_iters`` are ignored)
    and vectors are assigned by the same broadcast argmin the trainer
    uses. This is both the production shape (the quantizer is trained
    once, reused across batches) and what makes the whole chain
    SQL-expressible for the driver oracle (assignment = argmin over
    literal centroid rows — the ann_quantized_ivf probe-all trick).
    """
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError(
            f"threshold_micro must be in (0, 1e6], got {threshold_micro}"
        )
    # ONE projected scan of the input feeds everything downstream
    # (assignment, membership, the node relation) through the single
    # ``members`` persist below: the caller's ``embeddings`` is often a
    # union of scans/derivations, and every un-persisted reference
    # re-evaluated all of them (round-12 A/B on the doc_clusters slot:
    # the input was re-scanned 6+ times). The per-vector norm is
    # precomputed here too, so the within-cell self-join pays ONE array
    # fold per pair (the dot product) instead of three —
    # dot(a,b)/(norm(a)*norm(b)) with norms read from the cache is
    # bit-identical to computing the norms per pair (same folds, same
    # op order). The cache footprint is what the previous ``members``
    # persist already carried (id, vector, +1 double).
    from ..functions.vectors import dot

    base = embeddings.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", F.sqrt(dot(F.col("v"), F.col("v"))))
    if centroids is not None:
        # Caller-supplied quantizer: the k×dim centroid table is tiny
        # and BOUNDED BY CONSTRUCTION (a trained coarse quantizer —
        # k cells, the same boundedness argument as every broadcast in
        # this family), so collect it and fold the argmin into the SAME
        # projection that computes the norm: one scan, zero crossJoin /
        # groupBy / join-back stages. F.least over the per-centroid
        # (dist, cell) structs is exactly the old
        # min(struct(dist, cell)) aggregate — identical squared-L2
        # folds per centroid (array order), identical (d, then c)
        # tie-break — pinned against _assign in tests.
        from .kmeans import _sq_l2

        cent_rows = sorted(
            (r["cell"], list(r["centroid"])) for r in centroids.collect()
        )
        if not cent_rows:
            raise ValueError("centroids relation is empty")
        dcs = [
            F.struct(
                _sq_l2(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in c]),
                ).alias("d"),
                F.lit(int(cell)).alias("c"),
            )
            for cell, c in cent_rows
        ]
        members = base.withColumn(
            "cell", F.least(*dcs)["c"] if len(dcs) > 1 else dcs[0]["c"]
        ).persist()
    else:
        base = base.persist()
        assigned, _centroids = kmeans_fit_assign(
            base,
            k=n_cells,
            iters=kmeans_iters,
            id_col=id_col,
            vec_col="v",
        )
        members = (
            base.join(assigned.select(id_col, "cell"), id_col)
            .persist()
        )
    # skew guard: over-cap cells never reach the self-join (see module
    # docstring). No broadcast hint — AQE broadcasts the tiny hot list.
    hot = (
        members.groupBy("cell")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > cell_cap)
        .select("cell")
    )
    capped = members.join(hot, "cell", "left_anti")
    a = capped.select(
        "cell",
        F.col(id_col).alias("ida"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = capped.select(
        "cell",
        F.col(id_col).alias("idb"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    from ..functions.vectors import dot as _dot

    edges = (
        a.join(b, "cell")
        .filter(F.col("ida") < F.col("idb"))
        .withColumn(
            "cos_micro",
            # same value as functions.vectors.cosine(va, vb): the norms
            # come precomputed from the base cache (identical folds),
            # only the dot is per-pair work
            F.floor(
                _dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
                * 1_000_000
            ).cast("long"),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
        .select("ida", "idb")
    )
    # labels come back eagerly checkpointed (components.py) on the
    # distributed path, or as a broadcast-joined local relation on the
    # small-graph fast path — either way the edge lineage is dead after
    # this call.
    labels = connected_components(
        members.select(id_col),
        edges,
        id_col=id_col,
        src="ida",
        dst="idb",
    )
    # members stays persisted to the end: the RETURNED relation's cell
    # join (and, on the fast path, the node-id leg components builds at
    # action time) read it lazily — unpersisting here would re-evaluate
    # the caller's input scans per downstream action. CALLER CONTRACT
    # (round-12 ADVICE): DataFrame persists are held by the
    # CacheManager, NOT garbage-collected — a long-lived session
    # calling semantic_dedup repeatedly must release the previous
    # call's cache (spark.catalog.clearCache(), as bench.py does
    # between passes) or corpus-sized (id, vector, norm) entries
    # accumulate. The kmeans-path internals (base, assigned) are dead
    # now and released eagerly.
    if centroids is None:
        assigned.unpersist()
        base.unpersist()
    cells = members.select(id_col, "cell")

    from pyspark.sql import Window

    w = Window.partitionBy("group_id")
    return (
        labels.withColumnRenamed("cluster_id", "group_id")
        .join(cells, id_col)
        .select(
            id_col,
            "cell",
            "group_id",
            F.count("*").over(w).alias("n_members"),
            (F.col(id_col) == F.col("group_id")).cast("int").alias("keep"),
        )
    )
