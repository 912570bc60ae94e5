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


def bucket(name: str) -> str:
    n = name.lower()
    if "wjobs" in n or "tile_fwd" in n or "tile_bwd" in n:
        return "windowed conv kernels"
    if "flash" in n or "_fwd_kernel" in n or "_bwd_" in n:
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


def main(trace_dir: str):
    xs = load_xspace(trace_dir)
    totals = collections.Counter()
    per_op = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur_ms = ev.duration_ps / 1e9
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
