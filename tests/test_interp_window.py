"""Windowed interp (core/interp_window.py): host-side worklist invariants,
a numpy simulation of the kernel algorithm (validates the worklist + the
weighted-one-hot math without a TPU — the compiled kernels are covered by
tests/test_interp_window_tpu.py), and the point-sorting pipeline contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from csn_tpu.core.interp import interpolate_to_points
from csn_tpu.core.interp_window import (
    WINDOW_B, WINDOW_F, interp_bwd_jobs, interp_fwd_jobs,
)
from csn_tpu.core.window_conv import F_ACTIVE, F_FIRST, F_LAST, TILE
from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
from csn_tpu.models import load_model


def make_shapes(B=2, n=3000, seed=0):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        coords = (v * rng.uniform(0.6, 1.0)).astype(np.float32)
        feats = coords.copy()
        labels = rng.integers(0, 5, size=n).astype(np.int32)
        shapes.append((coords, feats, labels))
    return shapes


def _batch(sort=True, use_windows=True, B=2, n=3000, voxel=0.06):
    cls = load_model("HRNetSeg2S")
    spec = pyramid_spec_for_model(cls, num_points=n, voxel_size=voxel,
                                  conv1_kernel_size=3, shrink=1.5,
                                  use_windows=use_windows, sort_points=sort)
    return collate_shapes(make_shapes(B, n), spec)


def simulate_fwd(flat, idxT, wT, meta, window):
    """Numpy re-implementation of _interp_fwd_kernel's semantics."""
    n_vox, c = flat.shape
    n_pts = idxT.shape[1]
    np_pad = -(-n_pts // TILE) * TILE
    idx_p = np.pad(idxT, ((0, 0), (0, np_pad - n_pts)),
                   constant_values=n_vox)
    w_p = np.pad(wT, ((0, 0), (0, np_pad - n_pts)))
    flat_p = np.pad(flat, ((0, window + 16), (0, 0)))
    out = np.zeros((np_pad, c))
    cap = meta.shape[1]
    for j in range(cap):
        t, s, fl = int(meta[0, j]), int(meta[2, j]), int(meta[3, j])
        if not fl & F_ACTIVE:
            continue
        sl = slice(t * TILE, (t + 1) * TILE)
        for k in range(8):
            rows = idx_p[k, sl]
            rel = np.where(rows < n_vox, rows - s, -1)
            hit = (rel >= 0) & (rel < window)
            out[sl][hit] += (w_p[k, sl][hit, None]
                             * flat_p[s + np.where(hit, rel, 0)][hit])
    return out[:n_pts]


def simulate_bwd(g, idxT, wT, meta, window, n_vox):
    """Numpy re-implementation of _interp_bwd_kernel's semantics."""
    n_pts, c = g.shape
    g_p = np.pad(g, ((0, window + 128), (0, 0)))
    colpad = -(-n_pts // 128) * 128 + window - n_pts
    idx_p = np.pad(idxT, ((0, 0), (0, colpad)), constant_values=n_vox)
    w_p = np.pad(wT, ((0, 0), (0, colpad)))
    nv_pad = -(-n_vox // TILE) * TILE
    out = np.zeros((nv_pad, c))
    cap = meta.shape[1]
    for j in range(cap):
        t, s, fl = int(meta[0, j]), int(meta[2, j]), int(meta[3, j])
        if not fl & F_ACTIVE:
            continue
        vbase = t * TILE
        for k in range(8):
            idx = idx_p[k, s:s + window]
            w = w_p[k, s:s + window]
            vrel = idx - vbase
            hit = (vrel >= 0) & (vrel < TILE)
            np.add.at(out[vbase:vbase + TILE],
                      vrel[hit], w[hit, None] * g_p[s:s + window][hit])
    return out[:n_vox]


def _tables(vb):
    B, P, _ = vb.interp_idx.shape
    L0 = vb.masks[0].shape[1]
    idxT = vb.interp_idx.reshape(B * P, 8).T.astype(np.int32)
    wT = vb.interp_w.reshape(B * P, 8).T.astype(np.float64)
    return idxT, wT, B * L0


def test_fwd_jobs_simulated_matches_reference():
    vb = _batch()
    assert "win!interp_f" in vb.kmaps and "win!interp_b" in vb.kmaps
    idxT, wT, n_vox = _tables(vb)
    rng = np.random.default_rng(3)
    flat = rng.normal(size=(n_vox, 7))
    out = simulate_fwd(flat, idxT, wT, vb.kmaps["win!interp_f"], WINDOW_F)
    B = vb.interp_idx.shape[0]
    ref = np.asarray(interpolate_to_points(
        jnp.asarray(flat.reshape(B, -1, 7)),
        jnp.asarray(vb.interp_idx), jnp.asarray(vb.interp_w))).reshape(
        -1, 7)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_bwd_jobs_simulated_matches_scatter():
    vb = _batch()
    idxT, wT, n_vox = _tables(vb)
    B, P, _ = vb.interp_idx.shape
    rng = np.random.default_rng(4)
    g = rng.normal(size=(B * P, 7))
    out = simulate_bwd(g, idxT, wT, vb.kmaps["win!interp_b"], WINDOW_B,
                       n_vox)
    # reference: explicit scatter-add of every valid contribution
    ref = np.zeros((n_vox, 7))
    flat_idx = vb.interp_idx.reshape(-1, 8)
    flat_w = vb.interp_w.reshape(-1, 8)
    for k in range(8):
        ok = flat_idx[:, k] < n_vox
        np.add.at(ref, flat_idx[ok, k], flat_w[ok, k, None] * g[ok])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_bwd_meta_invariants():
    vb = _batch()
    meta = vb.kmaps["win!interp_b"]
    idxT, _, n_vox = _tables(vb)
    n_tiles = -(-n_vox // TILE)
    act = (meta[3] & F_ACTIVE) != 0
    jt = meta[0][act]
    assert (np.diff(jt) >= 0).all()                      # tile-sorted
    assert (meta[2][act] % 128 == 0).all()               # 128-aligned starts
    # per tile exactly one FIRST and one LAST
    for fl, bit in ((F_FIRST, "first"), (F_LAST, "last")):
        cnt = np.bincount(meta[0][(meta[3] & fl) != 0], minlength=n_tiles)
        assert (cnt == 1).all(), bit
    # row4 ranges partition the active jobs
    assert meta[4, n_tiles] == act.sum()
    # windows of one tile are disjoint (consecutive stride == WINDOW_B)
    for t in np.unique(jt):
        ss = np.sort(meta[2][act & (meta[0] == t)])
        assert (np.diff(ss) >= WINDOW_B).all()


def test_sorted_points_pipeline_contract():
    """sort_points permutes every per-point array together: p2v monotone per
    shape, (point, label) multiset preserved, interp readout consistent."""
    vb_s = _batch(sort=True)
    vb_u = _batch(sort=False, use_windows=False)
    B, P = vb_s.point_to_voxel.shape
    for b in range(B):
        p2v = vb_s.point_to_voxel[b][vb_s.point_mask[b]]
        assert (np.diff(p2v) >= 0).all()
        # same multiset of (rounded point, label) pairs as the unsorted build
        def key(vb):
            pts = np.round(vb.points[b][vb.point_mask[b]], 4)
            labs = vb.labels[b][vb.point_mask[b]]
            return sorted(map(tuple, np.concatenate(
                [pts, labs[:, None]], axis=1).tolist()))
        assert key(vb_s) == key(vb_u)
    # readout on the sorted batch matches a per-point recompute
    idxT, wT, n_vox = _tables(vb_s)
    rng = np.random.default_rng(5)
    flat = rng.normal(size=(n_vox, 4)).astype(np.float32)
    out = np.asarray(interpolate_to_points(
        jnp.asarray(flat.reshape(B, -1, 4)), jnp.asarray(vb_s.interp_idx),
        jnp.asarray(vb_s.interp_w)))
    ref = np.zeros((B * P, 4), np.float32)
    fi, fw = vb_s.interp_idx.reshape(-1, 8), vb_s.interp_w.reshape(-1, 8)
    for k in range(8):
        ok = fi[:, k] < n_vox
        ref[ok] += fw[ok, k, None] * flat[fi[ok, k]]
    np.testing.assert_allclose(out.reshape(-1, 4), ref, rtol=1e-5, atol=1e-5)


def test_interp_batch_falls_back_without_metas():
    from csn_tpu.core.interp import interp_batch

    vb = _batch(sort=False, use_windows=False)
    assert "win!interp_f" not in vb.kmaps
    jb = vb.to_jax()
    B, L0 = vb.masks[0].shape
    rng = np.random.default_rng(6)
    flat = jnp.asarray(rng.normal(size=(B, L0, 5)).astype(np.float32))
    out = interp_batch(flat, jb)
    ref = interpolate_to_points(flat, jb.interp_idx, jb.interp_w,
                                jb.point_to_voxel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_traces_through_windowed_interp(dtype):
    """Abstract-trace jax.grad through the windowed path (eval_shape never
    executes the Pallas kernels, so this runs on CPU). Catches residual
    bugs in the custom_vjp — non-JAX-type leaves or static shapes captured
    as tracers — which otherwise only surface on TPU hardware."""
    import jax

    from csn_tpu.core.interp import interp_batch

    vb = _batch()
    jb = vb.to_jax()
    assert "win!interp_f" in jb.kmaps
    B, L0 = vb.masks[0].shape

    def loss(f):
        return jnp.sum(interp_batch(f, jb).astype(jnp.float32))

    g = jax.eval_shape(jax.grad(loss), jax.ShapeDtypeStruct((B, L0, 5),
                                                            dtype))
    assert g.shape == (B, L0, 5) and g.dtype == dtype


def test_concat_drops_interp_metas():
    from csn_tpu.core.pyramid import concat_jax_batches

    vb1, vb2 = _batch(), _batch()
    cat = concat_jax_batches([vb1.to_jax(), vb2.to_jax()])
    assert "win!interp_f" not in cat.kmaps
    assert "win!interp_b" not in cat.kmaps
