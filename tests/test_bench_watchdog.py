"""bench.py watchdog unit tests (VERDICT r4 #1).

The watchdog is the mechanism that turns a wedged axon relay into a parsed
partial artifact instead of a driver rc=124 — it must emit exactly one JSON
line with the stage reached and exit 0, and a normal run's `_emit` must
disarm it so a success line can never be followed by a breach line.
(Live proof, 2026-08-20: a donate=0 recompile under full-suite contention
breached a 600 s budget and the driver-visible output was the clean partial
JSON; see STATUS.md round-5 notes.)
"""

import importlib.util
import json
import os
import time


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _wait_for(pred, timeout=8.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_watchdog_breach_emits_partial_json_and_exits_zero(monkeypatch,
                                                           capsys):
    bench = _load_bench()
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    wd = bench._Watchdog()
    wd.budget_s = 0.15
    wd.set_metric("test_metric", unit="widgets/sec")
    wd.set_stage("compile_and_first_step")
    wd.arm()
    assert _wait_for(lambda: exits), "watchdog never fired"
    assert exits == [0]  # exit 0: a parsed partial artifact, not a failure
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith("{")]
    assert len(out_lines) == 1, out_lines
    rec = json.loads(out_lines[0])
    assert rec["metric"] == "test_metric"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["aborted_at"] == "compile_and_first_step"
    assert rec["unit"] == "widgets/sec"
    assert rec["elapsed_s"] >= 0.1


def test_emit_disarms_watchdog_single_json_line(monkeypatch, capsys):
    bench = _load_bench()
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    wd = bench._Watchdog()
    # budget 2s >> the arm->_emit gap (so no flake even if the contended
    # 1-core box preempts the main thread), then sleep past the budget to
    # prove the disarmed watchdog never fires.
    wd.budget_s = 2.0
    monkeypatch.setattr(bench, "WD", wd)
    wd.arm()
    bench._emit(1.0, 0.1)
    time.sleep(2.5)
    assert exits == []
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.strip().startswith("{")]
    assert len(out_lines) == 1
    assert json.loads(out_lines[0])["value"] == 1.0


def test_budget_zero_disables_watchdog(monkeypatch):
    bench = _load_bench()
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    wd = bench._Watchdog()
    wd.budget_s = 0.0
    wd.arm()          # no thread started
    time.sleep(0.3)
    assert exits == []


def test_watchdog_env_budget_override(monkeypatch):
    monkeypatch.setenv("BENCH_BUDGET_S", "123.5")
    bench = _load_bench()
    assert bench._Watchdog().budget_s == 123.5
