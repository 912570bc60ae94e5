"""Useful-FLOP audit for the headline bench protocol (VERDICT r3 #4).

Computes, from the EXACT batch bench.py builds (same shapes, seed, spec),
the number of floating-point operations a *perfect* implementation of the
reference semantics must execute per training step — and from the measured
step time, the model-FLOP utilization (MFU). "Useful" means:

  * sparse convs: 2 * active_pairs * Cin * Cout per conv application, where
    active_pairs is the TRUE (input voxel, output voxel, offset) pair count
    of this batch's kernel maps — no padding rows, no one-hot overhead
    (what MinkowskiEngine's gather-GEMM-scatter computes, minus its own
    gather cost; `MinkowskiNet/models/*` via ME).
  * dense/pointwise layers (Conv1x1 heads, MHA projections): 2 * rows *
    Cin * Cout with rows scaled by the level's voxel occupancy (padded
    rows are not useful work).
  * attention cores: 2 * B * H * Lq * Lk * (d_k + d_v), occupancy-scaled
    on both Lq and Lk (the reference loops shapes and attends valid
    voxels only, `models/attention.py:30-44`).
  * trilinear voxel->point readout: 8 corners * multiply-add.
  * backward = 2x forward matmul FLOPs (d_input + d_weights), EXCEPT convs
    with input_grad=False (the stem: raw-data input has no consumer, only
    dW is computed) where backward = 1x. Optimizer/norm/elementwise work
    is not counted (sub-1% at these widths). Rematerialization recompute
    (flash) is deliberately excluded: it is implementation overhead, not
    useful work.

Also estimates the EXECUTED MXU gather MACs of the windowed one-hot conv
kernels (core/window_conv.py) from this batch's job worklists, so the
one-hot overhead ratio documented in STATUS.md is derived, not asserted.

Run (no TPU needed; uses jax.eval_shape + flax interception, zero compute):
  python scripts/flop_audit.py [--step-ms 233.8]

The output feeds BENCH_AUDIT.md; re-run after protocol changes.
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peak: 197 TFLOP/s bf16 (the headline compute dtype). Source: public
# TPU v5e spec (394 TOPS int8, half that bf16); same figure used by the
# scaling-book roofline model.
V5E_BF16_PEAK = 197e12


def _frac_table(batches, caps):
    """occupancy fraction per level-cap row count (valid voxels / capped)."""
    fracs = {}
    for lvl, cap in enumerate(caps):
        tot = sum(int(b.num_voxels[lvl].sum()) for b in batches)
        n = sum(b.num_voxels[lvl].shape[0] for b in batches)
        fracs[cap] = tot / float(n * cap)
    return fracs


def _occ(fracs, dim):
    """Occupancy fraction for a row-dimension: exact cap match, or a
    multiple of a cap (concatenated/combined layouts); 1.0 otherwise."""
    if dim in fracs:
        return fracs[dim]
    for cap, f in fracs.items():
        if dim % cap == 0:
            return f
    return 1.0


def count_pairs(batches):
    """True (in,out,offset) pair count per kernel map, summed over the
    query batch and the K key batches (additive under the combined pass)."""
    pairs = {}
    for vb in batches:
        for name, kmap in vb.kmaps.items():
            if name.startswith("win!"):
                continue
            lvls = _map_levels_of(name)
            if lvls is None:
                continue
            src = lvls[0]
            sentinel = vb.masks[src].shape[0] * vb.masks[src].shape[1]
            pairs[name] = pairs.get(name, 0) + int((kmap < sentinel).sum())
    return pairs


def _map_levels_of(name):
    from csn_tpu.core.pyramid import _map_levels

    try:
        return _map_levels(name)
    except Exception:
        return None


def executed_gather_macs(batches, conv_calls):
    """Estimated EXECUTED one-hot gather MACs of the windowed conv kernels:
    per job, per offset in its ksize^2 group, the [256, W] x [W, Cin_pad]
    gather matmul (core/window_conv.py one-hot design). Lane quantization
    (output padded to 128 lanes) makes small-Cin gathers cost ~Cin=128;
    both raw and lane-quantized numbers are returned."""
    from csn_tpu.core.window_conv import window_for_map

    raw = quant = 0
    njobs_by_map = {}
    for vb in batches:
        for name, meta in vb.kmaps.items():
            if not name.startswith("win!") or "interp" in name:
                continue
            mname = name[4:]
            if _map_levels_of(mname) is None:  # same skip rule as
                continue                       # count_pairs()
            from csn_tpu.core.window_conv import TILE

            n_out = vb.kmaps[mname].shape[1]
            # meta[4, n_tiles] is the job-count terminator; the tile
            # size must match the worklist builder's (a hardcoded 256
            # would silently read a mid-array offset if TILE changes)
            n_tiles = -(-n_out // TILE)
            njobs_by_map[mname] = njobs_by_map.get(mname, 0) \
                + int(meta[4, n_tiles])
    for mname, cin, cout, ncalls in conv_calls:
        if mname not in njobs_by_map:
            continue
        ksz = int(mname.rsplit("k", 1)[1])
        w = window_for_map(mname)
        per_call = njobs_by_map[mname] * ksz ** 2 * 256 * w
        raw += ncalls * per_call * max(cin, 8)
        quant += ncalls * per_call * max(cin, 128)
    return raw, quant


def audit(step_ms: float, batch_div: int = 1):
    import jax
    import flax.linen as nn

    import bench
    from csn_tpu.config import Config
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from csn_tpu.models.layers import SparseConv
    from csn_tpu.ops.attention import MultiHeadAttention

    # --- the EXACT headline protocol (bench.py main()) ---
    B, P, VOXEL, K = 8 // batch_div, 10000, 0.05, 1
    NUM_CLASSES = 39
    rng = np.random.default_rng(0)
    cls = load_model("HRNetSimCSN3S")
    model = cls(out_channels=NUM_CLASSES, conv1_kernel_size=5, d_model=256,
                n_head=4, k_neighbors=K, use_flash=False,  # same useful flops
                compute_dtype=Config().resolved_compute_dtype())
    spec = pyramid_spec_for_model(cls, num_points=P, voxel_size=VOXEL,
                                  conv1_kernel_size=5, level0_cap=5632,
                                  shrink=3.0, use_windows=True,
                                  dense_stem_grid=0)
    qb_host = collate_shapes(
        [bench.make_surface_shape(rng, P) for _ in range(B)], spec, rng=rng)
    kb_hosts = [collate_shapes(
        [bench.make_surface_shape(rng, P) for _ in range(B)], spec, rng=rng)
        for _ in range(K)]
    batches = [qb_host] + kb_hosts
    fracs = _frac_table(batches, spec.level_caps)
    pairs = count_pairs(batches)

    # --- intercept every module call during an abstract init trace ---
    conv_calls = {}    # (map, cin, cout) -> n_calls
    dense_rows = []    # (rows_occ_scaled, cin, cout, bwd_mult)
    attn_cores = []    # (b, h, lq, lk, dk, dv, occ_q, occ_k)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__":
            if isinstance(mod, SparseConv):
                x = args[1]
                key = (mod.map_name, int(x.shape[-1]), int(mod.features),
                       2 if mod.input_grad else 1)
                conv_calls[key] = conv_calls.get(key, 0) + 1
            elif isinstance(mod, nn.Dense):
                x = args[0]
                rows = int(np.prod(x.shape[:-1]))
                occ = _occ(fracs, int(x.shape[-2])) if x.ndim >= 2 else 1.0
                dense_rows.append((rows * occ, int(x.shape[-1]),
                                   int(mod.features)))
            elif isinstance(mod, MultiHeadAttention):
                q, k = args[0], args[1]
                attn_cores.append((int(q.shape[0]), mod.n_head,
                                   int(q.shape[1]), int(k.shape[1]),
                                   mod.d_k, mod.d_v,
                                   _occ(fracs, int(q.shape[1])),
                                   _occ(fracs, int(k.shape[1]))))
        return next_fun(*args, **kwargs)

    qb = qb_host.to_jax(compact=False)
    kbs = tuple(kb.to_jax(compact=False) for kb in kb_hosts)
    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            lambda r: model.init(r, qb, kbs, train=False),
            jax.random.PRNGKey(0))

    # --- useful FLOPs ---
    conv_fwd = conv_bwd = 0.0
    conv_table = []
    for (mname, cin, cout, bwd_mult), ncalls in sorted(conv_calls.items()):
        p = pairs.get(mname)
        assert p is not None, f"no kernel map pairs for conv {mname}"
        f = 2.0 * p * cin * cout * ncalls
        conv_fwd += f
        conv_bwd += f * bwd_mult
        conv_table.append((mname, cin, cout, ncalls, p, f))
    dense_fwd = sum(2.0 * r * ci * co for r, ci, co in dense_rows)
    attn_fwd = sum(2.0 * b * h * lq * lk * (dk + dv) * oq * ok
                   for b, h, lq, lk, dk, dv, oq, ok in attn_cores)
    interp_fwd = 2.0 * B * P * 8 * NUM_CLASSES
    fwd = conv_fwd + dense_fwd + attn_fwd + interp_fwd
    train = (conv_fwd + conv_bwd) + 3.0 * (dense_fwd + attn_fwd + interp_fwd)

    # --- executed one-hot gather MACs (windowed conv overhead) ---
    ex_raw, ex_quant = executed_gather_macs(
        batches, [(m, ci, co, n) for (m, ci, co, _), n
                  in conv_calls.items()])

    # --- report ---
    def tf(x):
        return x / 1e12

    print(f"protocol: HRNetSimCSN3S B={B} K={K} P={P} voxel={VOXEL} "
          f"caps={spec.level_caps} classes={NUM_CLASSES}")
    print(f"occupancy fractions (valid/capped rows): "
          + ", ".join(f"L{l}={fracs[c]:.3f}"
                      for l, c in enumerate(spec.level_caps)))
    print("\nper-map conv FLOPs (fwd, useful):")
    for mname, cin, cout, ncalls, p, f in conv_table:
        print(f"  {mname:12s} {cin:4d}->{cout:<4d} x{ncalls:<2d} "
              f"pairs={p:>9,d}  {f / 1e9:8.1f} GF")
    print(f"\nuseful forward FLOPs/step:   {tf(fwd):6.3f} TF "
          f"(conv {tf(conv_fwd):.3f}, dense {tf(dense_fwd):.3f}, "
          f"attn-core {tf(attn_fwd):.3f}, interp {tf(interp_fwd):.4f})")
    print(f"useful TRAIN FLOPs/step:     {tf(train):6.3f} TF "
          f"(bwd = 2x fwd; stem dW-only)")
    print(f"executed one-hot gather MACs/step (fwd, windowed convs): "
          f"{tf(2 * ex_raw):.2f} TF raw, {tf(2 * ex_quant):.2f} TF "
          f"lane-quantized (the kernels' real MXU issue rate)")
    if step_ms:
        t = step_ms / 1e3
        print(f"\nmeasured step: {step_ms:.1f} ms  ->  useful throughput "
              f"{tf(train) / t:.3f} TF/s")
        print(f"MFU vs v5e bf16 peak ({V5E_BF16_PEAK / 1e12:.0f} TF/s): "
              f"{train / t / V5E_BF16_PEAK * 100:.2f}%")
        # backward reuses the worklist on the transpose map (one gather per
        # job-offset, fused d_feats+dW): gather MACs ~ 2x forward total
        print(f"(executed-gather utilization at lane-quantized MACs: "
              f"~{(2 * ex_quant * 2) / t / V5E_BF16_PEAK * 100:.1f}% of peak "
              f"spent on gather matmuls alone, fwd+bwd)")
    return dict(fwd=fwd, train=train, conv=conv_fwd, dense=dense_fwd,
                attn=attn_fwd, interp=interp_fwd,
                executed_gather_fwd=2 * ex_quant)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=233.8,
                    help="measured headline ms/step (BENCH_r03: 233.8)")
    ap.add_argument("--batch-div", type=int, default=1,
                    help="divide B=8 by this (quick runs)")
    a = ap.parse_args()
    audit(a.step_ms, a.batch_div)
