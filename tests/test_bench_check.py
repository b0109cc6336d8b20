"""Unit tests for the bench regression guard's file handling and
escalation logic (tools/bench_check.py) — no Spark session involved.

Covers the round-4 ADVICE findings: the compact-line -> BENCH_LOCAL.json
swap must be validated as same-run (else the guard adjudicates a stale
run), --update must refuse to truncate the budget to the compact top-20,
and sweep-level degradation must fail even when every flagged query
retimes clean standalone.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


@pytest.fixture()
def bc(tmp_path, monkeypatch):
    """A fresh bench_check module instance with its file paths redirected
    into tmp_path (module-level constants, so reload per test)."""
    spec = importlib.util.spec_from_file_location(
        "bench_check_under_test", os.path.join(_TOOLS, "bench_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "LOCAL_PATH", str(tmp_path / "BENCH_LOCAL.json"))
    monkeypatch.setattr(
        mod, "LATEST_PATH", str(tmp_path / "BENCH_LOCAL.latest.json")
    )
    monkeypatch.setattr(mod, "BUDGET_PATH", str(tmp_path / "bench_budget.json"))
    return mod


def _write(path, doc):
    with open(path, "w") as fh:
        json.dump(doc, fh)


def _compact(value=10.0, sf=0.1, total=3, queries=None):
    return {
        "metric": "total_query_wall_sec",
        "value": value,
        "unit": "sec",
        "sf": sf,
        "queries": queries or {"a": 5.0, "b": 3.0},
        "queries_total": total,
        "queries_note": "top-20 slowest; full map in BENCH_LOCAL.json",
    }


def _local(value=10.0, sf=0.1, queries=None):
    return {
        "metric": "total_query_wall_sec",
        "value": value,
        "unit": "sec",
        "sf": sf,
        "sweep_total_sec": value,
        "queries": queries or {"a": 5.0, "b": 3.0, "c": 2.0},
    }


def test_full_passes_noncompact_through(bc):
    doc = _local()
    assert bc._full(doc) is doc


def test_full_swaps_in_matching_local(bc):
    _write(bc.LOCAL_PATH, _local())
    out = bc._full(_compact())
    assert len(out["queries"]) == 3  # the full map, not the top-20 slice
    assert not out.get("_partial")


def test_full_prefers_latest_over_committed(bc):
    """bench.py's default full-map output is the gitignored .latest file;
    when it matches the compact line it wins over the committed
    BENCH_LOCAL.json (which may be an older quiet-window artifact)."""
    _write(bc.LATEST_PATH, _local(queries={"a": 5.0, "b": 3.0, "c": 2.0}))
    _write(bc.LOCAL_PATH, _local(value=99.0))  # stale committed artifact
    out = bc._full(_compact())
    assert len(out["queries"]) == 3
    assert out["value"] == 10.0
    assert not out.get("_partial")


def test_full_falls_back_to_committed_when_latest_stale(bc):
    _write(bc.LATEST_PATH, _local(value=99.0))  # different run
    _write(bc.LOCAL_PATH, _local())
    out = bc._full(_compact())
    assert out["value"] == 10.0
    assert not out.get("_partial")


def test_full_rejects_stale_local_by_sf(bc, capsys):
    _write(bc.LOCAL_PATH, _local(sf=0.01))
    out = bc._full(_compact(sf=0.1))
    assert out.get("_partial") is True
    assert len(out["queries"]) == 2  # fell back to the compact slice
    assert "stale run" in capsys.readouterr().err


def test_full_rejects_stale_local_by_total(bc):
    _write(bc.LOCAL_PATH, _local(value=99.9))
    out = bc._full(_compact(value=10.0))
    assert out.get("_partial") is True


def test_full_marks_partial_when_local_missing(bc):
    out = bc._full(_compact())
    assert out.get("_partial") is True


def test_full_falls_back_on_corrupt_local(bc, capsys):
    """A truncated/mid-write BENCH_LOCAL.json is exactly the degraded
    input the fallback exists for: warn + compact-partial, never a
    JSONDecodeError crash (round-5 review)."""
    with open(bc.LOCAL_PATH, "w") as fh:
        fh.write('{"metric": "total_query_wall_sec", "queri')  # truncated
    out = bc._full(_compact())
    assert out.get("_partial") is True
    assert "unreadable" in capsys.readouterr().err


def test_update_refuses_partial_input(bc, tmp_path, capsys):
    # budget exists with many queries; input is compact with no local map
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {f"q{i}": 1.0 for i in range(40)}})
    inp = tmp_path / "run.json"
    _write(inp, _compact())
    assert bc.main(["--update", str(inp)]) == 1
    assert "refusing --update" in capsys.readouterr().err
    # the 40-query budget survived untouched
    with open(bc.BUDGET_PATH) as fh:
        assert len(json.load(fh)["queries"]) == 40


def test_update_records_total_sweep_sec(bc, tmp_path):
    _write(bc.BUDGET_PATH, {"notes": {"keep": "me"}, "queries": {}})
    inp = tmp_path / "run.json"
    _write(inp, _local(value=42.5))
    assert bc.main(["--update", str(inp)]) == 0
    with open(bc.BUDGET_PATH) as fh:
        doc = json.load(fh)
    assert doc["total_sweep_sec"] == 42.5
    assert doc["notes"] == {"keep": "me"}  # notes survive the rewrite


def test_ok_run_within_budget(bc, tmp_path):
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {"a": 5.0, "b": 3.0},
                            "total_sweep_sec": 8.0})
    inp = tmp_path / "run.json"
    _write(inp, _local(value=8.2, queries={"a": 5.1, "b": 3.1}))
    assert bc.main([str(inp)]) == 0


def test_sweep_level_guard_trips_when_all_queries_retime_clean(bc, tmp_path, monkeypatch, capsys):
    """Every query individually inside budget (no per-query flags at
    all), but the sweep total blew past RATIO x the recorded reference —
    the secondary guard must fail the run."""
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {"a": 5.0, "b": 3.0},
                            "total_sweep_sec": 8.0})
    inp = tmp_path / "run.json"
    run = _local(queries={"a": 5.2, "b": 3.2})
    run["value"] = run["sweep_total_sec"] = 30.0  # GC-pressure style blowup
    _write(inp, run)
    monkeypatch.setattr(bc, "_retime", lambda names: {n: 0.1 for n in names})
    assert bc.main([str(inp)]) == 1
    assert "SWEEP-LEVEL REGRESSION" in capsys.readouterr().out


def test_sweep_guard_credits_new_queries(bc, tmp_path):
    """New (unbudgeted) queries legitimately grow the total: their sweep
    time is added to the reference before the ratio applies."""
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {"a": 5.0, "b": 3.0},
                            "total_sweep_sec": 8.0})
    inp = tmp_path / "run.json"
    run = _local(queries={"a": 5.0, "b": 3.0, "new_heavy": 10.0})
    run["value"] = run["sweep_total_sec"] = 18.0
    _write(inp, run)
    assert bc.main([str(inp)]) == 0


def test_noise_adjudication_listed_in_ok_summary(bc, tmp_path, monkeypatch, capsys):
    """A sweep exceedance that retimes clean is reported as noise in the
    OK line instead of silently vanishing."""
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {"a": 2.0, "b": 3.0},
                            "total_sweep_sec": 5.0})
    inp = tmp_path / "run.json"
    run = _local(queries={"a": 4.0, "b": 3.0})  # a: sweep 4.0 > 1.5 x 2.0
    run["value"] = run["sweep_total_sec"] = 7.0
    _write(inp, run)
    monkeypatch.setattr(bc, "_retime", lambda names: {n: 1.9 for n in names})
    assert bc.main([str(inp)]) == 0
    out = capsys.readouterr().out
    assert "adjudicated as noise: a" in out


def test_confirmed_regression_still_fails(bc, tmp_path, monkeypatch, capsys):
    _write(bc.BUDGET_PATH, {"notes": {}, "queries": {"a": 2.0, "b": 3.0},
                            "total_sweep_sec": 5.0})
    inp = tmp_path / "run.json"
    run = _local(queries={"a": 9.0, "b": 3.0})
    run["value"] = run["sweep_total_sec"] = 12.0
    _write(inp, run)
    monkeypatch.setattr(bc, "_retime", lambda names: {n: 8.5 for n in names})
    assert bc.main([str(inp)]) == 1
    assert "REGRESSION  a" in capsys.readouterr().out
