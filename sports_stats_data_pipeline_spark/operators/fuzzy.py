"""Blocked fuzzy-key join — tolerant entity resolution for string keys.

The reference's gold join matches ``fights.fighter_a`` to
``fighters.Name`` by EXACT string equality (SURVEY.md §2.3 J2 /
fighters "Name" column) — one stray accent, middle initial, or
double-space and the row silently loses its enrichment. Real
entity-resolution joins tolerate small edits, but a naive
``levenshtein(a, b) <= d`` theta-join is a cartesian product — O(N·M)
comparisons, the classic scale-killer.

The standard fix is BLOCKING: hash both sides to coarse candidate keys
that any true match must share, equi-join on the block key (shuffled,
co-located — the same topology as every LSH family in this repo), and
only then evaluate the expensive edit-distance predicate on the
candidate pairs. Here the block key is ``soundex(first token) ||
length-bucket`` — phonetic normalization absorbs most typos'
spelling-level noise while the length bucket caps bucket width.
Recall contract: a pair whose typo CHANGES the soundex class or
length bucket is missed — same bounded-recall trade every blocked
join makes, stated rather than hidden (tests pin both directions).

All built-ins (soundex, levenshtein, concat) — JVM expressions,
no UDF; DuckDB twin in tests (same soundex + levenshtein semantics)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["block_key", "fuzzy_join"]


def block_key(name: str | Column, len_bucket: int = 4) -> Column:
    """soundex of the first whitespace token + length bucket — the
    candidate-generation key. Case-insensitive (soundex is, and exact
    re-checks happen on the edit distance)."""
    c = F.col(name) if isinstance(name, str) else name
    first = F.get(F.split(F.trim(c), r"\s+"), 0)
    return F.concat_ws(
        "|",
        F.soundex(first),
        (F.length(c) / len_bucket).cast("int").cast("string"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 2,
    len_bucket: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose keys are within ``max_dist`` edits, via blocking.

    Adds a ``key_dist`` column with the edit distance of the matched
    pair. ``how='left'`` keeps unmatched left rows (key_dist NULL) —
    the tolerant version of the reference's LEFT name-resolution join.
    Ambiguity is the caller's to resolve (e.g. window min(key_dist)
    per left row); this operator emits every in-tolerance candidate.

    A true match in a different block is missed (recall contract
    above); raise ``len_bucket`` or union several block functions for
    higher recall at higher candidate cost.

    When ``right_key`` collides with a left column name (the common
    both-sides-named-"name" entity-resolution case), the right side's
    key is emitted as ``{right_key}_right`` — unqualified references
    after the join would otherwise be AMBIGUOUS_REFERENCE.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    rk = right_key
    if right_key in left.columns:
        rk = f"{right_key}_right"
        if rk in left.columns or rk in right.columns:
            raise ValueError(
                f"fuzzy_join: cannot disambiguate right key — "
                f"{rk!r} already exists"
            )
        right = right.withColumnRenamed(right_key, rk)
    lb = left.withColumn("__blk_l", block_key(left_key, len_bucket))
    rb = right.withColumn("__blk_r", block_key(rk, len_bucket))
    dist = F.levenshtein(F.col(left_key), F.col(rk))
    # tolerance inside the join condition: the physical plan is still an
    # equi-join on the block key (Catalyst extracts the equality) with
    # the distance filter evaluated on candidate pairs; for how='left',
    # rows with no in-tolerance candidate survive with a NULL right
    # side — correct even when key values repeat on either side.
    joined = lb.join(
        rb, (F.col("__blk_l") == F.col("__blk_r")) & (dist <= max_dist), how
    )
    return joined.withColumn("key_dist", dist).drop("__blk_l", "__blk_r")