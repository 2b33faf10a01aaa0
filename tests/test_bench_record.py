"""tools/render_bench_table.py record loading — the round-10 slim
bench line splits per-query walls into BENCH_DETAILS.json, so the
renderer must follow the ``details`` pointer, and must REFUSE to pair a
slim record with a details file from a different run (summary-field
mismatch) rather than attribute the wrong walls to it."""

from __future__ import annotations

import importlib.util
import json
import os

_SPEC = importlib.util.spec_from_file_location(
    "render_bench_table",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "render_bench_table.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


_SLIM = {
    "metric": "headline_queries_total_wall",
    "value": 8.0,
    "unit": "sec",
    "queries": {"q1_pricing_summary": 8.0},
    "duckdb_total": 4.0,
    "ratio_vs_duckdb": 2.0,
    "extended_total": 10.0,
    "extended_ratio": 2.5,
    "extended_ratio_r8_subset": 2.6,
    "extended_ratio_full": 2.7,
    "load_avg_1m": 1.0,
    "sf": 0.1,
    "details": "DETAILS_TEST.json",
}

_DETAILS = dict(
    _SLIM,
    duckdb_queries={"q1_pricing_summary": 4.0},
    extended_queries={"neardup_doc_clusters": 10.0},
    extended_duckdb_queries={"neardup_doc_clusters": 4.0},
    extended_duckdb_total=4.0,
    extended_duckdb_total_full=4.0,
)


def _write(tmp_path, name, obj):
    p = str(tmp_path / name)
    with open(p, "w") as fh:
        json.dump(obj, fh)
    return p


def test_load_record_follows_matching_details(tmp_path):
    rec_p = _write(tmp_path, "rec.json", _SLIM)
    _write(tmp_path, "DETAILS_TEST.json", _DETAILS)
    rec = _MOD._load_record(rec_p)
    assert rec["duckdb_queries"] == {"q1_pricing_summary": 4.0}
    assert rec["extended_queries"] == {"neardup_doc_clusters": 10.0}
    # and it renders with populated DuckDB cells, not degraded dashes
    out = _MOD.render(rec)
    assert "| q1_pricing_summary | 8.00 s | 4.00 s |" in out


def test_load_record_degrades_on_run_mismatch(tmp_path, capsys):
    rec_p = _write(tmp_path, "rec.json", _SLIM)
    stale = dict(_DETAILS, value=99.9)  # a different run's details
    _write(tmp_path, "DETAILS_TEST.json", stale)
    rec = _MOD._load_record(rec_p)
    assert "duckdb_queries" not in rec
    assert "different run" in capsys.readouterr().err
    # degraded render still works (dash cells, no crash)
    out = _MOD.render(rec)
    assert "| q1_pricing_summary | 8.00 s | — | — |" in out


def test_load_record_unwraps_driver_wrapper(tmp_path):
    _write(tmp_path, "DETAILS_TEST.json", _DETAILS)
    rec_p = _write(
        tmp_path, "BENCH_rX.json", {"n": 10, "rc": 0, "parsed": _SLIM}
    )
    rec = _MOD._load_record(rec_p)
    assert rec["extended_duckdb_queries"] == {
        "neardup_doc_clusters": 4.0
    }
