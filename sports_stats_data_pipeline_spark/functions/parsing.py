"""Messy-string parsers — the reference's silver-layer semantics as pure
column expressions (SURVEY.md §1.2 type table, §2.8 X2–X12).

Each parser reproduces the extraction behavior of the reference's
scrapers (cited per function) with one deliberate upgrade: malformed or
absent input yields a real NULL instead of a silent ``None``/``"N/A"``
sentinel (SURVEY.md §1.3). All expressions are built-ins (codegen'd,
no Python), and all are total — garbage in, NULL out, never an error —
which matters under Spark 4's default ANSI mode (hence ``try_cast`` /
``F.get`` instead of ``cast`` / ``element_at``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's absent-value sentinel (fights_scraper.py:88,131-135).
NA = "N/A"

CM_PER_INCH = 2.54
KG_PER_LB = 0.45359237


def nullify_na(col: Column) -> Column:
    """X12: ``"N/A"`` sentinel (and empty string) → real NULL."""
    return F.when((col == NA) | (col == ""), F.lit(None)).otherwise(col)


def _try_int(col: Column) -> Column:
    return nullify_na(F.trim(col)).try_cast("int")


def parse_record(col: Column) -> tuple[Column, Column, Column]:
    """X3: ``"W-L-D"`` record → (wins, losses, draws).

    ``"28-1-0"`` → (28, 1, 0); two-part ``"15-3"`` → draws NULL; garbage →
    all NULL (fighters_scraper.py:78-86 splits on ``-`` and indexes
    positionally with a fallback branch).
    """
    cleaned = F.trim(F.regexp_replace(col, "^Record:", ""))
    parts = F.split(cleaned, "-")
    return (
        _try_int(F.get(parts, 0)),
        _try_int(F.get(parts, 1)),
        _try_int(F.get(parts, 2)),
    )


def parse_height_cm(col: Column) -> Column:
    """``5' 11"`` → centimeters (fighters_scraper.py:95 label scan).

    Exact integer feet/inches × 2.54 — a single fp multiply, so the value
    is bit-identical on every engine.
    """
    feet = F.regexp_extract(col, r"^\s*(\d+)'", 1).try_cast("int")
    inches = F.regexp_extract(col, r"(\d+)\"", 1).try_cast("int")
    return ((feet * 12 + inches) * F.lit(CM_PER_INCH)).cast("double")


def parse_weight_kg(col: Column) -> Column:
    """``155 lbs.`` → kilograms (fighters_scraper.py:96)."""
    lbs = F.regexp_extract(col, r"(\d+)\s*lbs", 1).try_cast("int")
    return (lbs * F.lit(KG_PER_LB)).cast("double")


def parse_reach_cm(col: Column) -> Column:
    """``70"`` → centimeters (fighters_scraper.py:97)."""
    inches = F.regexp_extract(col, r"(\d+)\"", 1).try_cast("int")
    return (inches * F.lit(CM_PER_INCH)).cast("double")


def parse_pct(col: Column) -> Column:
    """X: ``58%`` → 0.58 (career stats, fighters_scraper.py:109-115)."""
    n = F.regexp_extract(col, r"(\d+)%", 1).try_cast("int")
    return (n / F.lit(100.0)).cast("double")


def parse_ref_date(col: Column) -> Column:
    """X4: ``Jul. 19, 1987`` (``%b. %d, %Y``) → date; unparseable → NULL
    (matches the reference's skip-on-ValueError, fighters_scraper.py:124-127).
    """
    return F.try_to_timestamp(
        nullify_na(F.trim(col)), F.lit("MMM. d, yyyy")
    ).cast("date")


def parse_of_pair(col: Column) -> tuple[Column, Column]:
    """``45 of 112`` → (landed, attempted) (fights_scraper.py:156-165,
    181-191)."""
    landed = F.regexp_extract(col, r"^\s*(\d+)\s+of\s+\d+", 1).try_cast("int")
    att = F.regexp_extract(col, r"of\s+(\d+)\s*$", 1).try_cast("int")
    return landed, att


def parse_mmss_seconds(col: Column) -> Column:
    """``3:42`` → 222 seconds (control time / end time,
    fights_scraper.py:98-105, 162-163)."""
    m = F.regexp_extract(col, r"^\s*(\d+):(\d{2})\s*$", 1).try_cast("int")
    s = F.regexp_extract(col, r"^\s*(\d+):(\d{2})\s*$", 2).try_cast("int")
    return (m * 60 + s).cast("int")


def parse_scheduled_rounds(col: Column) -> Column:
    """``5 Rnd (5-5-5-5-5)`` → 5 (fights_scraper.py:98-105 time_format)."""
    return F.regexp_extract(col, r"^\s*(\d+)\s+Rnd", 1).try_cast("int")


def normalize_label(col: Column) -> Column:
    """X7: ``"Time Format:"`` → ``time format`` (fights_scraper.py:94)."""
    return F.lower(F.trim(F.regexp_replace(col, ":", "")))


def dispatch_label(col: Column) -> Column:
    """X8: label → target-column dispatch with the reference's precedence
    (fights_scraper.py:98-105): 'round' (but not containing 'time'),
    exact 'time', 'time format', 'method'; anything else → NULL."""
    norm = normalize_label(col)
    return (
        F.when(norm.contains("time format"), F.lit("time_format"))
        .when(norm == "time", F.lit("time"))
        .when(norm.contains("round") & ~norm.contains("time"), F.lit("round"))
        .when(norm.contains("method"), F.lit("method"))
        .otherwise(F.lit(None).cast("string"))
    )


def activity_flag(last_fight_date: Column, as_of: str) -> Column:
    """A2: 'Active' iff the last fight is within 2 years of ``as_of``
    (fighters_scraper.py:117-133). ``datetime.now()`` is parameterized as
    ``as_of`` for determinism (SURVEY.md §7.1)."""
    years = F.datediff(F.lit(as_of).cast("date"), last_fight_date) / F.lit(365.0)
    return (
        F.when(last_fight_date.isNull(), F.lit("Inactive"))
        .when(years <= 2.0, F.lit("Active"))
        .otherwise(F.lit("Inactive"))
    )
