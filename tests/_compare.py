"""Order-insensitive DataFrame comparison, approximating the driver's
row-count + schema + value-hash check so oracle mismatches surface in
pytest before the driver sees them."""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon_cell(v) -> str:
    # None and float-NaN both mean SQL NULL, but the two engines' pandas
    # bridges pick different representations per column type; keep them
    # DISTINCT here so any cross-engine divergence fails loudly in pytest
    # before an opaque driver hasher sees it.
    if v is None:
        return "NULL:none"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL:nan"
        if v == int(v) and abs(v) < 2**53:
            # nullable-int columns surface as float64 on one side only
            return f"i:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, (bool,)):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, date):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if pd.isna(v):
        return "NULL"
    return f"s:{v}"


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first differing sorted rows "
            f"(spark vs oracle): {diffs}"
        )
