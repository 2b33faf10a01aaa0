"""Render the README performance table from a bench.py output record.

Usage::

    python tools/render_bench_table.py BENCH_r07.json

Accepts either the raw JSON line bench.py prints or the driver's
``BENCH_r{N}.json`` wrapper (uses its ``parsed`` field). Since round 7
bench.py itself times the DuckDB calibration in the same session
(``duckdb_queries`` / ``ratio_vs_duckdb``), so the README table is a
mechanical projection of one record instead of a hand-merged pair of
measurements — the round-6 verdict's comparability ask.
"""

from __future__ import annotations

import json
import sys


def _ratio_cell(spark: float, duck: float) -> str:
    if duck <= 0:
        return "—"
    r = spark / duck
    if r >= 1:
        return f"{r:.3g}× slower"
    return f"**{duck / spark:.3g}× faster**"


def render(rec: dict) -> str:
    if "parsed" in rec:
        rec = rec["parsed"]
    duck = rec.get("duckdb_queries") or {}
    lines = [
        "| Query | Spark | DuckDB | ratio |",
        "|---|---|---|---|",
    ]
    # proxy-oracled slots get the README's ¹ footnote (bench.ORACLE_PROXY)
    try:
        import os

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from bench import ORACLE_PROXY

        proxied = {k for k, v in ORACLE_PROXY.items() if v is not None}
    except Exception:
        proxied = set()
    folded = []  # spark-side slots folded into another slot's oracle
    for name, s in rec["queries"].items():
        if name not in duck:
            folded.append(name)
            continue
        d = duck[name]
        mark = "¹" if name in proxied else ""
        lines.append(
            f"| {name} | {s:.2f} s | {d:.2f} s{mark} | {_ratio_cell(s, d)} |"
        )
    total_s = rec["value"]
    total_d = rec.get("duckdb_total") or 0.0
    ratio = rec.get("ratio_vs_duckdb")
    lines.append(
        f"| **Headline total** | **{total_s:.2f} s** | **{total_d:.2f} s** "
        f"| **{ratio:.2f}×** |"
    )
    out = "\n".join(lines)
    if folded:
        out += (
            "\n\nFolded Spark slots (timed, compared through another "
            f"slot's oracle): {', '.join(folded)}."
        )
    return out


if __name__ == "__main__":
    with open(sys.argv[1]) as fh:
        print(render(json.load(fh)))
