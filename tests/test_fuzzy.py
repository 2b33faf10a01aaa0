"""operators.fuzzy — blocked edit-distance join: match/miss semantics,
left-join survival, duplicate-key correctness, the stated recall
contract, a DuckDB twin, and the equi-join plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.operators.fuzzy import (
    block_key,
    fuzzy_join,
)

FIGHTERS = [
    ("Jon Jones", 27),
    ("Daniel Cormier", 22),
    ("Stipe Miocic", 20),
    ("Francis Ngannou", 17),
]
# fight rows with typo'd names: 1-2 edits that keep the first token's
# soundex class, plus one unmatched and one too-far name.
FIGHTS = [
    (1, "Jon Jonez"),        # 1 edit
    (2, "Daniel Cormier"),   # exact
    (3, "Stipe Miocicc"),    # 1 edit
    (4, "Francis Nganou"),   # 1 edit
    (5, "Unknown Fighter"),  # no candidate
    (6, "Jonathan Jones"),   # same soundex block but 5 edits -> too far
]


def _dfs(spark):
    fighters = spark.createDataFrame(FIGHTERS, "name string, wins int")
    fights = spark.createDataFrame(FIGHTS, "fight_id int, fighter string")
    return fighters, fights


def test_inner_matches_and_distance(spark):
    fighters, fights = _dfs(spark)
    got = {
        r["fight_id"]: (r["name"], r["key_dist"])
        for r in fuzzy_join(fights, fighters, "fighter", "name", 2).collect()
    }
    assert got == {
        1: ("Jon Jones", 1),
        2: ("Daniel Cormier", 0),
        3: ("Stipe Miocic", 1),
        4: ("Francis Ngannou", 1),
    }
    # the typo'd keys really are typos (nonzero distance where intended)
    assert got[1][1] == 1 and got[2][1] == 0


def test_left_keeps_unmatched_rows(spark):
    fighters, fights = _dfs(spark)
    out = fuzzy_join(fights, fighters, "fighter", "name", 2, how="left")
    rows = {r["fight_id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[5]["name"] is None and rows[5]["key_dist"] is None
    assert rows[6]["name"] is None  # in-block but beyond tolerance
    with pytest.raises(ValueError):
        fuzzy_join(fights, fighters, "fighter", "name", 2, how="full")


def test_duplicate_left_keys_all_survive(spark):
    fighters, _ = _dfs(spark)
    dup = spark.createDataFrame(
        [(1, "Jon Jonez"), (2, "Jon Jonez")], "fight_id int, fighter string"
    )
    out = fuzzy_join(dup, fighters, "fighter", "name", 2, how="left")
    assert out.count() == 2
    assert out.filter(F.col("name").isNotNull()).count() == 2


def test_recall_contract_cross_block_miss(spark):
    # a typo in the FIRST character usually changes the soundex class:
    # 'Xon Jones' is 1 edit from 'Jon Jones' but lands in another block
    # and is missed — the documented bounded-recall trade.
    fighters, _ = _dfs(spark)
    probe = spark.createDataFrame([(9, "Xon Jones")], "fight_id int, fighter string")
    assert fuzzy_join(probe, fighters, "fighter", "name", 2).count() == 0


def test_matches_duckdb_twin(spark):
    fighters, fights = _dfs(spark)
    got = sorted(
        (r["fight_id"], r["name"], r["key_dist"])
        for r in fuzzy_join(fights, fighters, "fighter", "name", 2).collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            """
            WITH fighters(name, wins) AS (VALUES {f}),
            fights(fight_id, fighter) AS (VALUES {g})
            SELECT fight_id, name, CAST(levenshtein(fighter, name) AS INTEGER)
            FROM fights JOIN fighters
              ON levenshtein(fighter, name) <= 2
            """.format(
                f=", ".join(f"('{n}', {w})" for n, w in FIGHTERS),
                g=", ".join(f"({i}, '{n}')" for i, n in FIGHTS),
            )
        ).fetchall()
    )
    # the DuckDB twin is the UNBLOCKED exact answer; on this corpus no
    # true match crosses a block, so the blocked join must equal it.
    assert got == want


def test_plans_as_equi_join_not_cartesian(spark):
    import contextlib
    import io

    fighters, fights = _dfs(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fuzzy_join(fights, fighters, "fighter", "name", 2).explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_same_key_name_both_sides(spark):
    # both sides keyed "name" — the common entity-resolution shape; the
    # right key must come back disambiguated, not AMBIGUOUS_REFERENCE
    from sports_stats_data_pipeline_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [("jon smith", 1)], "name string, lid int"
    )
    right = spark.createDataFrame(
        [("john smith", 10), ("zzz", 11)], "name string, rid int"
    )
    out = fuzzy_join(left, right, "name", "name", max_dist=2)
    rows = out.collect()
    assert "name_right" in out.columns
    assert len(rows) == 1
    assert rows[0]["name"] == "jon smith"
    assert rows[0]["name_right"] == "john smith"
    assert rows[0]["key_dist"] == 1
