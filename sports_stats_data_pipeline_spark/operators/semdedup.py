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
    if centroids is not None:
        from .kmeans import _assign

        vecs = embeddings.select(
            F.col(id_col).alias("__id"),
            as_double(F.col(vec_col)).alias("__v"),
        )
        assigned = _assign(vecs, centroids).select(
            F.col("__id").alias(id_col), "cell"
        ).persist()
    else:
        assigned, _centroids = kmeans_fit_assign(
            embeddings,
            k=n_cells,
            iters=kmeans_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
    members = (
        embeddings.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("v")
        )
        .join(assigned.select(id_col, "cell"), id_col)
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
        "cell", F.col(id_col).alias("ida"), F.col("v").alias("va")
    )
    b = capped.select(
        "cell", F.col(id_col).alias("idb"), F.col("v").alias("vb")
    )
    edges = (
        a.join(b, "cell")
        .filter(F.col("ida") < F.col("idb"))
        .withColumn(
            "cos_micro",
            F.floor(cosine(F.col("va"), F.col("vb")) * 1_000_000).cast(
                "long"
            ),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
        .select("ida", "idb")
    )
    # labels come back eagerly checkpointed (components.py), so the
    # edge/member lineage is dead after this call; the tiny (id, cell)
    # relation is checkpointed too so the caches can be released now
    # rather than handed to the caller (GC-scoped, cf. quantize.py).
    labels = connected_components(
        embeddings.select(id_col),
        edges,
        id_col=id_col,
        src="ida",
        dst="idb",
    )
    cells = assigned.select(id_col, "cell").localCheckpoint(eager=True)
    members.unpersist()
    assigned.unpersist()

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
