"""Host-side measurement: what fraction of (job, offset) pairs in the
windowed-conv worklists gather ZERO valid rows?

The tile-grid kernels' inner loop (core/window_conv.py _tile_fwd_kernel)
runs the one-hot construction + 2 MXU matmuls for every offset of every
active job's group, even when that offset has no valid source row inside
the job's window (all one-hot columns zero -> the matmuls add zero). If a
large share of (job, offset) pairs are empty, a per-offset `pl.when(any
valid)` skip (or a meta bitmask) is worth building; if small, the idea is
closed by this measurement. Run on CPU:

    JAX_PLATFORMS=cpu PYTHONPATH= python scripts/probe_offset_skip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_surface_shape
from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
from csn_tpu.core.window_conv import TILE, F_ACTIVE, window_for_map
from csn_tpu.models import load_model


def main():
    rng = np.random.default_rng(0)
    cls = load_model("HRNetSimCSN3S")
    spec = pyramid_spec_for_model(cls, num_points=10000, voxel_size=0.05,
                                  conv1_kernel_size=5, level0_cap=5632,
                                  shrink=3.0, use_windows=True)
    B = 16
    vb = collate_shapes([make_surface_shape(rng, 10000) for _ in range(B)],
                        spec, rng=rng)

    print(f"{'map':>12s} {'jobs':>6s} {'K':>4s} {'group':>5s} "
          f"{'(job,k) pairs':>13s} {'empty':>7s} {'empty%':>7s} "
          f"{'padrow%':>8s}")
    tot_pairs = tot_empty = 0.0
    w_onehot = w_onehot_empty = 0.0
    for m in spec.maps:
        if m.ksize % 2 == 0:
            continue
        name = m.name
        meta = vb.kmaps.get("win!" + name)
        kmap = vb.kmaps[name]
        if meta is None:
            continue
        src_l = m.level + 1 if m.kind == "up" else m.level
        n_in = B * spec.level_caps[src_l]
        W = window_for_map(name)
        K = kmap.shape[0]
        group = m.ksize ** 2
        cap = meta.shape[1]
        flags = meta[3]
        act = (flags & F_ACTIVE) != 0
        jt, jg, js = meta[0][act], meta[1][act], meta[2][act]
        njobs = int(act.sum())
        pairs = njobs * group
        empty = 0
        padrows = 0
        totrows = 0
        for t, g, s in zip(jt, jg, js):
            rows = kmap[g * group:(g + 1) * group, t * TILE:(t + 1) * TILE]
            rel = rows.astype(np.int64) - s
            valid = (rows < n_in) & (rel >= 0) & (rel < W)
            empty += int((~valid.any(axis=1)).sum())
            # also: fraction of one-hot ROWS (tile rows) with no valid
            # source for a given offset -- the padding share inside
            # non-empty offsets
            padrows += int((~valid).sum())
            totrows += valid.size
        print(f"{name:>12s} {njobs:6d} {K:4d} {group:5d} {pairs:13d} "
              f"{empty:7d} {100*empty/max(pairs,1):6.1f}% "
              f"{100*padrows/max(totrows,1):7.1f}%")
        tot_pairs += pairs
        tot_empty += empty
        # one-hot work weighting: each (job, offset) costs T*W elements
        w_onehot += pairs * TILE * W
        w_onehot_empty += empty * TILE * W
    print(f"\nTOTAL pairs={int(tot_pairs)} empty={int(tot_empty)} "
          f"({100*tot_empty/max(tot_pairs,1):.1f}%)")
    print(f"one-hot element-work skippable: "
          f"{100*w_onehot_empty/max(w_onehot,1):.1f}%")


if __name__ == "__main__":
    main()
