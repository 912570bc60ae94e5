"""Per-op device-time budget from a jax.profiler trace.

Usage:
    BENCH_TRACE=/tmp/trace python bench.py     # capture (3 steps)
    python scripts/trace_budget.py /tmp/trace  # parse + bucket

Parses the XLA op events on the TPU device XLine(s) of the .xplane.pb and
buckets total duration by kernel family (windowed convs, flash, fusions,
copies), replacing the reference's chrome-trace profiling
(`MID-FC/ocnn_extraction/tfsolver.py:148-178`) with the jax/XLA-native
pipeline.
"""

import collections
import glob
import gzip
import json
import re
import sys


def load_xspace(trace_dir: str):
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def iter_chrome_ops(trace_dir: str):
    """Yield (name, dur_ms) for device XLA-Op events from the chrome-format
    trace.json.gz jax.profiler also writes — fallback when the installed
    tensorboard_plugin_profile has no xplane_pb2 (this image's does not)."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb or .trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f)["traceEvents"]
    dev_pids = set()
    op_tids = {}  # pid -> tid of its "XLA Ops" line
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "TPU" in e["args"].get("name", ""):
            dev_pids.add(e["pid"])
        if e.get("name") == "thread_name" and e["args"].get("name") == "XLA Ops":
            op_tids[e["pid"]] = e["tid"]
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("tid") == op_tids.get(e["pid"])):
            # strip XLA's .N uniquifier so repeats of one op aggregate
            yield re.sub(r"\.\d+$", "", e["name"]), e["dur"] / 1e3


def bucket(name: str) -> str:
    n = name.lower()
    if ("wjobs" in n or "tile_fwd" in n or "tile_bwd" in n
            or n.startswith("sparseconv") or n.startswith("conv")
            or n.startswith("trans_") or n.startswith("exchange")):
        return "windowed conv kernels"
    if ("flash" in n or "_fwd_kernel" in n or "_bwd_" in n
            or n.startswith("mha")):
        return "flash attention kernels"
    if n.startswith("fusion") or ".fusion" in n:
        return "XLA fusions"
    if "copy" in n or "transpose" in n or "bitcast" in n or "pad" in n:
        return "copies/layout"
    if "dot" in n or "conv" in n:
        return "XLA matmuls"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    return "other"


def iter_xplane_ops(trace_dir: str):
    xs = load_xspace(trace_dir)
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        for line in plane.lines:
            # only the op-level line: module/step lines ENCLOSE the ops and
            # counting them too would double every duration
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                yield name, ev.duration_ps / 1e9


def main(trace_dir: str):
    try:
        ops = list(iter_xplane_ops(trace_dir))
    except ImportError:
        ops = list(iter_chrome_ops(trace_dir))
    totals = collections.Counter()
    per_op = collections.Counter()
    for name, dur_ms in ops:
        totals[bucket(name)] += dur_ms
        per_op[name] += dur_ms
    total = sum(totals.values())
    print(f"device op time over trace: {total:.1f} ms")
    for k, v in totals.most_common():
        print(f"  {k:28s} {v:9.2f} ms  ({100 * v / max(total, 1e-9):.1f}%)")
    print("top ops:")
    for k, v in per_op.most_common(15):
        print(f"  {v:9.2f} ms  {k[:90]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace")
