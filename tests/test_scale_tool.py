"""Unit pins for tools/run_scale_validation.py's mechanical table
render — the per-slot SCALING.md table must come from the junit XML,
not hand transcription, so the parser itself needs a pin."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "run_scale_validation",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "run_scale_validation.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


_JUNIT = """<?xml version="1.0" encoding="utf-8"?>
<testsuites>
  <testsuite name="pytest" errors="0" failures="1" skipped="1" tests="4">
    <testcase classname="t" name="test_replica_parity[q3_shipping_priority]" time="12.5"/>
    <testcase classname="t" name="test_replica_parity[neardup_minhash_pairs]" time="310.2">
      <failure message="boom">boom</failure>
    </testcase>
    <testcase classname="t" name="test_skew_parity[topk_orders_per_segment]" time="3.0">
      <skipped message="no skew dir"/>
    </testcase>
    <testcase classname="t" name="test_replica_nndescent_incremental_equals_full" time="99.0"/>
  </testsuite>
</testsuites>
"""


def test_render_table_parses_junit(tmp_path):
    junit = tmp_path / "junit.xml"
    junit.write_text(_JUNIT)
    out = _MOD.render_table(str(junit), factor=100, sampled=17,
                            total_wall=600.0)
    lines = out.splitlines()
    # header carries provenance
    assert "factor 100" in lines[0] and "sampled mod 17" in lines[0]
    # sorted by wall descending, slot names stripped of the test prefix
    assert lines[2].startswith("| neardup_minhash_pairs | 310 s | FAIL |")
    assert lines[3].startswith(
        "| test_replica_nndescent_incremental_equals_full | 99 s | ok |"
    )
    assert lines[4].startswith("| q3_shipping_priority | 12 s | ok |")
    # skipped cases never render as slots; totals count pass/fail only
    assert "topk_orders_per_segment" not in out
    assert "**2/3 value-matched, 1 skipped**" in lines[-1]
    assert "**10 min**" in lines[-1]


def test_derive_marker_gates_reuse(tmp_path, monkeypatch):
    """Reuse requires the DERIVED.json marker to match the requested
    recipe exactly — a workdir holding a different factor's corpus (or
    a pre-marker one) must be refused, not silently validated under
    the wrong table header (round-9 self-review catch)."""
    import json

    import pytest

    workdir = str(tmp_path / "scale")
    os.makedirs(workdir)
    for t in _MOD.TABLES:
        open(os.path.join(workdir, f"{t}.parquet"), "w").close()

    # all tables present but no marker -> refuse
    with pytest.raises(SystemExit, match="mismatched corpus"):
        _MOD.derive("/src", workdir, factor=100, force=False)

    # marker from a DIFFERENT factor -> refuse
    with open(os.path.join(workdir, "DERIVED.json"), "w") as fh:
        json.dump({"src": "/src", "mode": "replicate", "factor": 60}, fh)
    with pytest.raises(SystemExit, match="mismatched corpus"):
        _MOD.derive("/src", workdir, factor=100, force=False)

    # matching marker -> reuse without invoking the deriver
    monkeypatch.setattr(
        _MOD.subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("derived!")),
    )
    with open(os.path.join(workdir, "DERIVED.json"), "w") as fh:
        json.dump({"src": "/src", "mode": "replicate", "factor": 100}, fh)
    _MOD.derive("/src", workdir, factor=100, force=False)


def test_derive_trust_existing_adopts_without_rebuild(
    tmp_path, monkeypatch
):
    """--trust-existing (round-10 advice): a known-good pre-marker (or
    mismatched-marker) workdir can be ADOPTED — the marker is written
    from the requested recipe and the multi-hour deriver is never
    invoked; a later plain derive() then reuses it."""
    import json

    workdir = str(tmp_path / "scale")
    os.makedirs(workdir)
    for t in _MOD.TABLES:
        open(os.path.join(workdir, f"{t}.parquet"), "w").close()
    monkeypatch.setattr(
        _MOD.subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("derived!")),
    )

    # no marker at all -> adopt writes the recipe
    _MOD.derive("/src", workdir, factor=100, force=False, trust=True)
    with open(os.path.join(workdir, "DERIVED.json")) as fh:
        assert json.load(fh) == {
            "src": "/src", "mode": "replicate", "factor": 100,
        }
    # and the adopted marker satisfies a subsequent normal derive
    _MOD.derive("/src", workdir, factor=100, force=False)

    # trust on a MISSING corpus must still derive (adoption only skips
    # the rebuild when every table file is already present)
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    import pytest

    with pytest.raises(AssertionError, match="derived!"):
        _MOD.derive("/src", empty, factor=100, force=False, trust=True)


def test_missing_junit_preserves_exit_code(tmp_path, monkeypatch, capsys):
    """If pytest dies before flushing the junit XML (the documented
    OOM failure mode), the wrapper must report and exit with pytest's
    code instead of masking it with a FileNotFoundError traceback."""
    import pytest

    workdir = str(tmp_path)
    monkeypatch.setattr(_MOD, "derive", lambda *a, **k: None)
    monkeypatch.setattr(_MOD, "run_tier", lambda *a, **k: -9)
    monkeypatch.setattr(
        "sys.argv",
        ["run_scale_validation.py", "--factor", "100",
         "--workdir", workdir, "--sampled", "17"],
    )
    with pytest.raises(SystemExit) as exc:
        _MOD.main()
    assert exc.value.code == -9
    out = capsys.readouterr().out
    assert "without writing" in out
