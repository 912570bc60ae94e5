"""scripts/trace_budget.py parsers: the xplane iterator must count ONLY the
'XLA Ops' line (module/step lines enclose the ops; counting them once
doubled every duration), and the chrome fallback must aggregate device op
events by de-uniquified name."""

import gzip
import importlib.util
import json
import os
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "trace_budget", os.path.join(REPO, "scripts", "trace_budget.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_xspace():
    def ev(mid, ps):
        return types.SimpleNamespace(metadata_id=mid, duration_ps=ps)

    meta = {1: types.SimpleNamespace(id=1, name="fusion.1"),
            2: types.SimpleNamespace(id=2, name="copy.2")}
    op_line = types.SimpleNamespace(
        name="XLA Ops", events=[ev(1, 5e9), ev(2, 3e9)])
    # one module event spanning both ops: must NOT be counted
    mod_line = types.SimpleNamespace(
        name="XLA Modules", events=[ev(1, 8e9)])
    step_line = types.SimpleNamespace(name="Steps", events=[ev(1, 8e9)])
    plane = types.SimpleNamespace(
        name="/device:TPU:0", lines=[mod_line, op_line, step_line],
        event_metadata=types.SimpleNamespace(values=lambda: meta.values()))
    host = types.SimpleNamespace(name="/host:CPU", lines=[op_line],
                                 event_metadata=types.SimpleNamespace(
                                     values=lambda: meta.values()))
    return types.SimpleNamespace(planes=[plane, host])


def test_iter_xplane_ops_counts_only_op_line(monkeypatch):
    tb = _load()
    monkeypatch.setattr(tb, "load_xspace", lambda d: _fake_xspace())
    ops = list(tb.iter_xplane_ops("/nonexistent"))
    assert sorted(ops) == [("copy.2", 3.0), ("fusion.1", 5.0)]
    # device op total is 8 ms, not 16 (module line) nor 24 (+steps)
    assert sum(d for _, d in ops) == 8.0


def test_iter_chrome_ops_fallback(tmp_path):
    tb = _load()
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 7,
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 8,
         "args": {"name": "Steps"}},
        # two instances of one op (uniquified) + one on a non-op line +
        # one on a non-device pid: only the first two count, aggregated
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.3", "dur": 2000},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.4", "dur": 1000},
        {"ph": "X", "pid": 1, "tid": 8, "name": "step", "dur": 9000},
        {"ph": "X", "pid": 2, "tid": 7, "name": "hostop", "dur": 9000},
    ]
    d = tmp_path / "plugins"
    d.mkdir()
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    ops = list(tb.iter_chrome_ops(str(tmp_path)))
    assert ops == [("fusion", 2.0), ("fusion", 1.0)]
