"""Explicit schemas (SURVEY.md §1.3): bronze = faithful all-string ingest
(the reference's dynamic dict schema pinned down), silver = typed targets
of the functions.parsing casts (FIXTURES.md §A3).

Column order follows the reference's dict-insertion order
(fighters_scraper.py:136-156 + URL at :183; fights_scraper.py:195-211).
"""

from __future__ import annotations

from pyspark.sql import types as T

_s = T.StringType()


def _string_struct(names: list[str]) -> T.StructType:
    return T.StructType([T.StructField(n, _s, nullable=True) for n in names])


#: bronze fighter row — every field a nullable string.
FIGHTERS_RAW = _string_struct(
    [
        "Name",
        "Nickname",
        "Record",
        "Height",
        "Weight",
        "Reach",
        "STANCE",
        "DOB",
        "SLpM",
        "Str. Acc.",
        "SApM",
        "Str. Def",
        "TD Avg.",
        "TD Acc.",
        "TD Def.",
        "Sub. Avg.",
        "fight_dates",
        "URL",
    ]
)

_FIGHT_STATS = ["sig_str", "total_str", "td", "ctrl", "sub"]
_SIG_STATS = ["head", "body", "leg", "distance", "ground"]

#: bronze fight row — core fields + paired _a/_b stat columns.
FIGHTS_RAW = _string_struct(
    [
        "event_name",
        "fighter_a",
        "fighter_b",
        "result_a",
        "result_b",
        "method",
        "round",
        "time",
        "time_format",
    ]
    + [f"{c}_{side}" for c in _FIGHT_STATS for side in ("a", "b")]
    + [f"{c}_{side}" for c in _SIG_STATS for side in ("a", "b")]
    + ["fight_url"]
)

#: silver fighter row — typed (FIXTURES.md §A3 contract).
FIGHTERS_TYPED = T.StructType(
    [
        T.StructField("name", _s),
        T.StructField("nickname", _s),
        T.StructField("wins", T.IntegerType()),
        T.StructField("losses", T.IntegerType()),
        T.StructField("draws", T.IntegerType()),
        T.StructField("height_cm", T.DoubleType()),
        T.StructField("weight_kg", T.DoubleType()),
        T.StructField("reach_cm", T.DoubleType()),
        T.StructField("stance", _s),
        T.StructField("dob", T.DateType()),
        T.StructField("slpm", T.DoubleType()),
        T.StructField("str_acc", T.DoubleType()),
        T.StructField("sapm", T.DoubleType()),
        T.StructField("str_def", T.DoubleType()),
        T.StructField("td_avg", T.DoubleType()),
        T.StructField("td_acc", T.DoubleType()),
        T.StructField("td_def", T.DoubleType()),
        T.StructField("sub_avg", T.DoubleType()),
        T.StructField("last_fight_date", T.DateType()),
        T.StructField("active_status", _s),
        T.StructField("url", _s, nullable=False),
    ]
)


def fighters_raw_ddl() -> str:
    """DDL string for mapInPandas parse output (url first)."""
    cols = ["url string"] + [
        f"`{f.name}` string" for f in FIGHTERS_RAW if f.name != "URL"
    ]
    return ", ".join(cols)


def fights_raw_ddl() -> str:
    cols = ["url string"] + [
        f"`{f.name}` string" for f in FIGHTS_RAW if f.name != "fight_url"
    ]
    return ", ".join(cols)
