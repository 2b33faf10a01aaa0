"""Render the README performance table from a bench.py output record.

Usage::

    python tools/render_bench_table.py BENCH_r07.json

Accepts either the raw JSON line bench.py prints or the driver's
``BENCH_r{N}.json`` wrapper (uses its ``parsed`` field). Since round 7
bench.py itself times the DuckDB calibration in the same session
(``duckdb_queries`` / ``ratio_vs_duckdb``), so the README table is a
mechanical projection of one record instead of a hand-merged pair of
measurements — the round-6 verdict's comparability ask. Slots in
``bench.FOLDED_INTO`` are summed into their covering slot's row (that
oracle times the superset), matching bench.py's documented comparison;
pre-round-7 records (no duckdb fields) and degraded no-ratio records
render with ``—`` cells instead of crashing.
"""

from __future__ import annotations

import json
import os
import sys


#: bench.py records round(best, 3) — a genuine measurement can round to
#: 0.0 s; clamp to half the rounding quantum instead of treating it as
#: missing (None is missing; 0.0 is a real, tiny time)
_TINY = 0.0005


def _ratio_cell(spark: float, duck: float | None) -> str:
    if duck is None:
        return "—"
    # clamp BOTH sides: either engine's round(best, 3) can be 0.0
    spark = max(spark, _TINY)
    duck = max(duck, _TINY)
    r = spark / duck
    if r >= 1:
        return f"{r:.3g}× slower"
    return f"**{duck / spark:.3g}× faster**"


def render(rec: dict) -> str:
    if "parsed" in rec:
        rec = rec["parsed"]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import FOLDED_INTO, ORACLE_PROXY

    duck = rec.get("duckdb_queries") or {}
    #: proxy-oracled rows carry the README's ¹ footnote: either the
    #: oracle is another slot's (ORACLE_PROXY) or the row sums folded
    #: Spark slots against one covering oracle (FOLDED_INTO)
    proxied = {k for k, v in ORACLE_PROXY.items() if v is not None}
    proxied |= set(FOLDED_INTO.values())
    # round 12: the headline tier gets the same job-netted column the
    # extended tier has (records without the fields render the old
    # 4-column table)
    hl_netted = rec.get("headline_ratios_netted") or {}
    hl_jobs = rec.get("headline_job_counts") or {}
    hl_hdr = " netted⁵ |" if hl_netted else ""
    lines = [
        "| Query | Spark | DuckDB | ratio |" + hl_hdr,
        "|---|---|---|---|" + ("---|" if hl_netted else ""),
    ]
    for name, s in rec["queries"].items():
        if name in FOLDED_INTO:
            continue  # summed into the covering slot's row below
        label = name
        jobs = hl_jobs.get(name, 0)
        for folded, cover in FOLDED_INTO.items():
            if cover == name and folded in rec["queries"]:
                s += rec["queries"][folded]
                label += f" + {folded}"
                jobs += hl_jobs.get(folded, 0)
        d = duck.get(name)
        mark = "¹" if name in proxied and d is not None else ""
        d_cell = (
            f"{max(d, _TINY):.2f} s{mark}" if d is not None else "—"
        )
        row = f"| {label} | {s:.2f} s | {d_cell} | {_ratio_cell(s, d)} |"
        if hl_netted:
            nv = hl_netted.get(label.replace(" + ", "+"))
            row += (
                f" {nv:g}× ({jobs} jobs) |" if nv is not None else " — |"
            )
        lines.append(row)
    total_s = rec["value"]
    total_d = rec.get("duckdb_total")
    ratio = rec.get("ratio_vs_duckdb")
    # bench.py's documented failure sentinel is ({}, 0.0): an EMPTY
    # duckdb_queries means the calibration degraded — render "—", never
    # a bogus 0.00 s total. A genuine tiny total always comes with a
    # populated per-query dict.
    total_d_cell = (
        f"**{max(total_d, _TINY):.2f} s**"
        if duck and total_d is not None
        else "—"
    )
    ratio_cell = f"**{ratio:.2f}×**" if ratio is not None else "—"
    lines.append(
        f"| **Headline total** | **{total_s:.2f} s** | {total_d_cell} "
        f"| {ratio_cell} |" + (" |" if hl_netted else "")
    )
    # extended calibrated subset (round 8): the expensive composites'
    # drift-immune two-engine comparison; uncalibrated extended slots
    # keep their raw Spark seconds with a "—" DuckDB cell.
    ext = rec.get("extended_queries")
    if ext:
        ext_duck = rec.get("extended_duckdb_queries") or {}
        # slots whose Spark wall includes in-gate physical work the
        # oracle never performs (writes, commits, deliberate recounts):
        # marked ³ so their ratio reads as a regression series, not a
        # race (round 9; reasons rendered below the table). Only the
        # record's OWN field is trusted: falling back to the current
        # bench constant would stamp this round's reasons (Z-order
        # rewrite, versioned read-backs) onto records from rounds
        # whose slots never ran those legs — a factually wrong
        # footnote on exactly the honesty annotation this exists for.
        # Pre-round-9 records simply render unmarked.
        asym = rec.get("extended_asymmetric") or {}
        # slots whose wall measured SF-INVARIANT (round 10): their ratio
        # is Spark's per-job constant, not data work — marked ⁴ with the
        # measured sweep rendered below. Same own-field-only rule as ³.
        fixed = rec.get("extended_fixed_overhead") or {}
        # round 11: job-constant-netted ratios (wall minus the slot's
        # measured n_jobs x per-job constant) — the mechanical form of
        # the fixed-overhead argument; rendered as an extra column when
        # the record carries them, omitted for older records.
        netted = rec.get("extended_ratios_netted") or {}
        jobs = rec.get("extended_job_counts") or {}
        net_hdr = " netted⁵ |" if netted else ""
        lines += [
            "",
            f"| Extended (composites) | Spark | DuckDB | ratio |{net_hdr}",
            "|---|---|---|---|" + ("---|" if netted else ""),
        ]
        for name, s in ext.items():
            d = ext_duck.get(name)
            mark = ""
            if d is not None:
                mark = "³" if name in asym else ("⁴" if name in fixed else "")
            d_cell = (
                f"{max(d, _TINY):.2f} s{mark}" if d is not None else "—"
            )
            net_cell = ""
            if netted:
                nv = netted.get(name)
                net_cell = (
                    f" {nv:.2f}× ({jobs.get(name, '?')} jobs) |"
                    if nv is not None
                    else " — |"
                )
            lines.append(
                f"| {name} | {s:.2f} s | {d_cell} | {_ratio_cell(s, d)} |"
                + net_cell
            )
        ext_ratio = rec.get("extended_ratio")
        ext_total_d = rec.get("extended_duckdb_total")
        # full-tier two-engine row when the record carries walls for
        # every slot (round 10+); else the legacy bare Spark total row.
        # The calibrated-subset row renders EITHER WAY — it is the
        # cross-round series bench.py preserves by name — with its
        # slots taken from bench.EXTENDED_CALIBRATED when the duck dict
        # covers the whole tier (ext_duck keys no longer identify the
        # subset then). Gate on None (missing), not truthiness: 0.0 is
        # a real, tiny time (the module's _TINY convention).
        ext_ratio_full = rec.get("extended_ratio_full")
        ext_total_d_full = rec.get("extended_duckdb_total_full")
        full_tier = (
            ext_ratio_full is not None
            and ext_total_d_full is not None
            and set(ext) <= set(ext_duck)
        )
        if full_tier:
            lines.append(
                f"| **Whole tier ({len(ext_duck)} slots)** "
                f"| **{sum(ext.values()):.2f} s** "
                f"| **{max(ext_total_d_full, _TINY):.2f} s** "
                f"| **{ext_ratio_full:.2f}×** |"
            )
        else:
            lines.append(
                f"| **Extended total (all slots)** "
                f"| **{rec.get('extended_total', 0.0):.2f} s** | — | — |"
            )
        if ext_duck and ext_total_d is not None and ext_ratio is not None:
            from bench import EXTENDED_CALIBRATED

            subset = (
                [n for n in EXTENDED_CALIBRATED if n in ext]
                if full_tier
                else [n for n in ext_duck if n in ext]
            )
            sub_s = sum(ext[n] for n in subset)
            lines.append(
                f"| **Calibrated subset ({len(subset)} slots)** "
                f"| **{sub_s:.2f} s** "
                f"| **{max(ext_total_d, _TINY):.2f} s**² "
                f"| **{ext_ratio:.2f}×**² |"
            )
        marked = [n for n in asym if n in ext_duck]
        if marked:
            lines.append("")
            lines.append(
                "³ asymmetric by construction — the slot's ratio is a "
                "drift-immune regression series, NOT a two-engine race:"
            )
            for name in marked:
                lines.append(f"  - `{name}`: {asym[name]}")
        fixed_marked = [n for n in fixed if n in ext_duck]
        if fixed_marked:
            lines.append("")
            lines.append(
                "⁴ fixed-overhead at this scale — the wall measured "
                "SF-INVARIANT over a 100× data sweep, so the ratio "
                "prices Spark's per-job constant, not the plan:"
            )
            for name in fixed_marked:
                lines.append(f"  - `{name}`: {fixed[name]}")
        if netted:
            pjc = rec.get("per_job_constant")
            spread = rec.get("per_job_constant_spread")
            slot_c = rec.get("extended_slot_constants") or {}
            how = (
                "each slot's ADJACENT constant (sampled next to that "
                "slot's own timed pass)"
                if slot_c
                else f"the measured per-job constant"
                + (f" of {pjc:.3f} s" if pjc else "")
            )
            lines.append("")
            lines.append(
                f"⁵ netted = (Spark wall − n_jobs × {how}) / DuckDB "
                "wall — the slot's data-term ratio after removing "
                "Spark's fixed per-job scheduling cost (job counts "
                "measured per slot via job groups; AQE stages run as "
                "separate jobs)."
                + (
                    f" Run-wide constant median {pjc:.4f} s, "
                    f"start/mid/end spread {spread:.2f}×."
                    if pjc and spread
                    else ""
                )
            )
            dropped = rec.get("extended_ratios_netted_dropped") or []
            if dropped:
                lines.append(
                    "  - dropped from netting (no DuckDB calibration): "
                    + ", ".join(f"`{n}`" for n in dropped)
                )
    return "\n".join(lines)


def _load_record(path: str) -> dict:
    """Load a bench record, following its ``details`` pointer when the
    per-query dicts were split out of the printed line (round 10): the
    driver-captured slim line carries only totals/ratios, so rendering
    it directly would degrade every DuckDB cell to '—' on a healthy
    run. The pointer resolves relative to the record file, then to the
    repo root (where bench.py writes it)."""
    with open(path) as fh:
        rec = json.load(fh)
    inner = rec.get("parsed") or rec
    details_name = inner.get("details")
    if details_name and "extended_queries" not in inner:
        here = os.path.dirname(os.path.abspath(path))
        repo = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        for cand in (
            os.path.join(here, details_name),
            os.path.join(repo, details_name),
        ):
            if os.path.exists(cand):
                with open(cand) as fh:
                    details = json.load(fh)
                # the details file is only THIS record's if it is the
                # same RUN — matched on the unique run_id both carry
                # since round 11; pre-round-11 records (no run_id) fall
                # back to matching three summary fields. A
                # driver-archived slim record rendered after a newer
                # bench run must degrade, not borrow the newer run's
                # per-query walls.
                same_run = (
                    details.get("run_id") == inner["run_id"]
                    if "run_id" in inner
                    else all(
                        details.get(k) == inner.get(k)
                        for k in ("value", "extended_total", "load_avg_1m")
                    )
                )
                if same_run:
                    merged = dict(details)
                    merged.update(inner)
                    return merged
                print(
                    f"note: {cand} is from a different run than "
                    f"{path} (summary fields differ) — rendering the "
                    "slim record degraded",
                    file=sys.stderr,
                )
    return rec


if __name__ == "__main__":
    print(render(_load_record(sys.argv[1])))
