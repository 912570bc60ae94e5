"""Windowed point<->voxel interpolation kernels (Pallas).

The trilinear voxel->point readout (`core/interp.py`, the ME
`soutput.interpolate(field)` equivalent — `MinkowskiNet/lib/
trainer_csn.py:201`) is, per step, one row-granular XLA gather forward
(~5 ms at bench scale: 8 corner rows x 10k points x 39-ch logit rows) and
one SERIAL scatter-add backward (~8 ms: XLA lowers scatter at ~13 ns/row).
With points SORTED by containing voxel (core/pyramid.py `sort_points`),
both directions become windowed one-hot matmuls on the MXU, reusing the
worklist machinery of core/window_conv.py:

  forward  (point tiles):  out[p] = sum_k w[p,k] * flat[idx[p,k]]
      per job: DMA a contiguous voxel window, build the WEIGHTED one-hot
      oh[p_rel, v_rel] = sum_k w[p,k] * (idx[p,k] - start == v_rel)  (VPU),
      one [TILE, W] @ [W, C] f32 matmul per job.
  backward (voxel tiles):  dflat[v] = sum_{p,k} w[p,k]*(idx[p,k]==v)*g[p]
      the exact transpose: DMA a contiguous POINT window of the cotangent
      plus the matching idx/w slices, build the transposed weighted one-hot
      oh[v_rel, p_rel], one [TILE, W] @ [W, C] matmul — NO scatter.

Contributions are counted exactly once: a tile's jobs carry disjoint
windows, and a (p, k) pair matches only the one-hot column of its own
window / the iota row of its own voxel tile. f32 end to end (the logits
path is deliberately f32 — see Conv1x1(f32=True)); accumulation in VMEM
f32 scratch.
"""

from __future__ import annotations

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csn_tpu.core.window_conv import (
    TILE, F_ACTIVE, F_FIRST, F_LAST, META_ROWS, WindowOverflow, window_jobs,
    _default_nbuf,
)

WINDOW_F = 512      # voxel rows per forward job
WINDOW_B = 1024     # point rows per backward job


def interp_fwd_jobs(interp_idx: np.ndarray, n_vox: int,
                    window: int = WINDOW_F, cap_mult: float = 2.0
                    ) -> np.ndarray:
    """Forward worklist: point tiles x one 8-corner offset group.

    interp_idx [B, P, 8] absolute int32 (sentinel >= n_vox). Delegates to
    window_jobs on the [8, B*P] transposed table — corners of a sorted
    point tile fall in a narrow voxel window, exactly like conv kmaps."""
    idxT = np.ascontiguousarray(
        interp_idx.reshape(-1, 8).T.astype(np.int32))
    return window_jobs(idxT, n_vox, tile=TILE, window=window, group=8,
                       cap_mult=cap_mult, align=16)


def interp_bwd_jobs(interp_idx: np.ndarray, n_vox: int,
                    window: int = WINDOW_B, cap_mult: float = 3.0,
                    align: int = 128) -> np.ndarray:
    """Backward worklist: voxel tiles x contiguous point windows.

    For voxel tile t, [tmin[t], tmax[t]] bounds the points owning any
    corner in t (exact bounds; points sorted by voxel make them narrow).
    Disjoint consecutive windows cover the span — points inside a window
    without a corner in t are wasted one-hot columns, never wrong ones.
    align=128: the kernel slices the [8, n_pts] idx/w tables along dim 1,
    and Mosaic requires 128-lane-aligned HBM slices there."""
    flat = interp_idx.reshape(-1, 8)
    n_pts = flat.shape[0]
    valid = flat < n_vox
    n_tiles = -(-n_vox // TILE)
    ng = 1
    cap = int(np.ceil(cap_mult * n_tiles * ng / 64.0) * 64) + 64

    rows = np.repeat(np.arange(n_pts, dtype=np.int64), 8)[valid.ravel()]
    ts = (flat.ravel()[valid.ravel()] // TILE).astype(np.int64)
    tmin = np.full(n_tiles, np.iinfo(np.int64).max)
    tmax = np.full(n_tiles, -1, np.int64)
    np.minimum.at(tmin, ts, rows)
    np.maximum.at(tmax, ts, rows)

    jobs_t, jobs_s = [], []
    for t in range(n_tiles):
        if tmax[t] < 0:
            jobs_t.append(t)      # empty tile: dummy zero-init/write job
            jobs_s.append(0)
            continue
        s = (int(tmin[t]) // align) * align
        while True:
            jobs_t.append(t)
            jobs_s.append(s)
            if s + window > tmax[t]:
                break
            s += window
    jt = np.asarray(jobs_t, np.int64)
    js = np.asarray(jobs_s, np.int64)
    n_jobs = jt.shape[0]
    if n_jobs > cap:
        raise WindowOverflow(
            f"{n_jobs} interp-bwd jobs > capacity {cap} ({n_tiles} tiles, "
            f"window={window})")

    flags = np.full(n_jobs, F_ACTIVE, np.int64)
    newt = np.ones(n_jobs, bool)
    newt[1:] = jt[1:] != jt[:-1]
    flags[newt] |= F_FIRST
    lastt = np.ones(n_jobs, bool)
    lastt[:-1] = jt[:-1] != jt[1:]
    flags[lastt] |= F_LAST

    meta = np.zeros((META_ROWS, cap), np.int32)
    meta[0, :n_jobs] = jt
    meta[2, :n_jobs] = js
    meta[3, :n_jobs] = flags
    meta[4, :n_tiles] = np.searchsorted(jt, np.arange(n_tiles))
    meta[4, n_tiles] = n_jobs
    if n_jobs < cap:
        meta[0, n_jobs:] = jt[-1] if n_jobs else 0
    return meta


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _onehot_f32(rows, start, n_in, window):
    """[TILE, window] f32 one-hot of (rows - start); invalid rows match no
    column. Same bits-based construction as window_conv._onehot_tile
    (value selects of float constants trip Mosaic relayout limits), kept
    f32 — the logits path is f32 by design."""
    rel = jnp.where(rows < n_in, rows - start, -1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, window), 1)
    one_bits = jnp.int32(0x3F800000)
    hit = jnp.where(rel[:, None] == cols, one_bits, 0)
    return pltpu.bitcast(hit, jnp.float32)


def _interp_fwd_kernel(meta_ref, idx_ref, w_ref, flat_hbm, out_ref,
                       win_scratch, sem, acc_ref, *,
                       window: int, n_vox: int, cap: int, nbuf: int,
                       n_tiles: int):
    """Grid = point tiles. idx_ref/w_ref: [8, TILE] blocks of the transposed
    corner tables; flat_hbm: [n_vox_pad, Cpad] f32 voxel features."""
    t = pl.program_id(0)
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj], 16)
        return pltpu.make_async_copy(
            flat_hbm.at[pl.ds(start, window), :], win_scratch.at[slot],
            sem.at[slot])

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when((t == 0) & active(0))
    def _():
        dma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            dma((j + 1) % nbuf, j + 1).start()

        @pl.when(active(j))
        def _():
            dma(j % nbuf, j).wait()
            start = meta_ref[2 * cap + j]

            def corner(k, oh):
                rows = idx_ref[k, :]
                return oh + _onehot_f32(rows, start, n_vox,
                                        window) * w_ref[k, :][:, None]

            oh = jax.lax.fori_loop(
                0, 8, corner, jnp.zeros((TILE, window), jnp.float32),
                unroll=True)
            acc_ref[...] += jax.lax.dot_general(
                oh, win_scratch[j % nbuf],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _interp_bwd_kernel(meta_ref, g_hbm, idx_hbm, w_hbm, dflat_ref,
                       g_scratch, i_scratch, w_scratch, sem, acc_ref, *,
                       window: int, n_vox: int, cap: int, nbuf: int,
                       n_tiles: int):
    """Grid = voxel tiles. Per job, DMA the point-cotangent window plus the
    matching idx/w column slices; oh[v_rel, p_rel] accumulates the weighted
    transposed one-hot over the 8 corners; one matmul into the f32 acc."""
    t = pl.program_id(0)
    lo = meta_ref[4 * cap + t]
    hi = meta_ref[4 * cap + t + 1]

    def dma(slot, jj):
        start = pl.multiple_of(meta_ref[2 * cap + jj], 128)
        return (
            pltpu.make_async_copy(g_hbm.at[pl.ds(start, window), :],
                                  g_scratch.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(idx_hbm.at[:, pl.ds(start, window)],
                                  i_scratch.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(w_hbm.at[:, pl.ds(start, window)],
                                  w_scratch.at[slot], sem.at[slot, 2]),
        )

    def start_all(slot, jj):
        for c in dma(slot, jj):
            c.start()

    def wait_all(slot, jj):
        for c in dma(slot, jj):
            c.wait()

    def active(jj):
        return (meta_ref[3 * cap + jj] & F_ACTIVE) != 0

    @pl.when((t == 0) & active(0))
    def _():
        start_all(0, 0)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def job_body(j, _):
        @pl.when(jnp.logical_and(j + 1 < meta_ref[4 * cap + n_tiles],
                                 active(j + 1)))
        def _():
            start_all((j + 1) % nbuf, j + 1)

        @pl.when(active(j))
        def _():
            wait_all(j % nbuf, j)
            vbase = t * TILE
            vrows = jax.lax.broadcasted_iota(jnp.int32, (TILE, window),
                                             0) + vbase
            one_bits = jnp.int32(0x3F800000)

            # Python loop (static k) + [k:k+1, :] slices, NOT
            # fori_loop + [k, :]: a rank-reducing row read of a dynamically
            # slot-indexed scratch lowers to an unsupported gather /
            # dynamic_slice on v5e ("Only 2D gather is supported"), and
            # fori_loop's index stays a tracer even under unroll=True, which
            # rejects the static slice at trace time
            # (scripts/probe_iw_bwd.py P4 vs P6).
            oh = jnp.zeros((TILE, window), jnp.float32)
            for k in range(8):
                idx = i_scratch[j % nbuf][k:k + 1, :]
                hit = jnp.where(idx == vrows, one_bits, 0)
                oh = oh + (pltpu.bitcast(hit, jnp.float32)
                           * w_scratch[j % nbuf][k:k + 1, :])
            acc_ref[...] += jax.lax.dot_general(
                oh, g_scratch[j % nbuf],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return ()

    jax.lax.fori_loop(lo, hi, job_body, ())
    dflat_ref[...] = acc_ref[...].astype(dflat_ref.dtype)


# ---------------------------------------------------------------------------
# host wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pad_rows_lanes(x, row_pad_to, extra_rows=0):
    """Zero-pad rows to a multiple (plus window slack) and lanes to 128."""
    n, c = x.shape
    rows = -(-n // row_pad_to) * row_pad_to + extra_rows
    return jnp.pad(x, ((0, rows - n), (0, (-c) % 128)))


def _fwd_impl(flat, idxT, wT, meta_f, *, n_pts, window, nbuf):
    n_vox, c = flat.shape
    cpad = c + (-c) % 128
    flat_p = _pad_rows_lanes(flat.astype(jnp.float32), 16, window)
    np_pad = -(-n_pts // TILE) * TILE
    idx_p = jnp.pad(idxT, ((0, 0), (0, np_pad - n_pts)),
                    constant_values=n_vox)
    w_p = jnp.pad(wT.astype(jnp.float32), ((0, 0), (0, np_pad - n_pts)))
    cap = meta_f.shape[-1]
    n_tiles = np_pad // TILE
    kern = functools.partial(_interp_fwd_kernel, window=window, n_vox=n_vox,
                             cap=cap, nbuf=nbuf, n_tiles=n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, m: (0, t)),
            pl.BlockSpec((8, TILE), lambda t, m: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TILE, cpad), lambda t, m: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, window, cpad), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((TILE, cpad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_pad, cpad), jnp.float32),
    )(meta_f.reshape(-1), idx_p, w_p, flat_p)
    return out[:n_pts, :c]


def _bwd_impl(g, idxT, wT, meta_b, *, n_vox, window, nbuf):
    n_pts, c = g.shape
    cpad = c + (-c) % 128
    g_p = _pad_rows_lanes(g.astype(jnp.float32), 128, window)
    # idx/w column slices must stay in bounds for any 128-aligned start
    # <= n_pts (interp_bwd_jobs align=128)
    colpad = -(-n_pts // 128) * 128 + window - n_pts
    idx_p = jnp.pad(idxT, ((0, 0), (0, colpad)), constant_values=n_vox)
    w_p = jnp.pad(wT.astype(jnp.float32), ((0, 0), (0, colpad)))
    nv_pad = -(-n_vox // TILE) * TILE
    cap = meta_b.shape[-1]
    n_tiles = nv_pad // TILE
    kern = functools.partial(_interp_bwd_kernel, window=window, n_vox=n_vox,
                             cap=cap, nbuf=nbuf, n_tiles=n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TILE, cpad), lambda t, m: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, window, cpad), jnp.float32),
            pltpu.VMEM((nbuf, 8, window), jnp.int32),
            pltpu.VMEM((nbuf, 8, window), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, 3)),
            pltpu.VMEM((TILE, cpad), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nv_pad, cpad), jnp.float32),
    )(meta_b.reshape(-1), g_p, idx_p, w_p)
    return out[:n_vox, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def interp_window_apply(flat, idxT, wT, meta_f, meta_b,
                        n_pts: int, n_vox: int, window_f: int = WINDOW_F,
                        window_b: int = WINDOW_B):
    """flat [n_vox, C] f32 -> point features [n_pts, C] f32 via the
    windowed kernels; differentiable in `flat` (scatter-free backward).

    n_pts and n_vox are static (nondiff): the backward kernel's grid and
    padding are shape parameters, so they must not become tracers via the
    residual tuple (residuals are flattened into traced jaxpr outputs)."""
    return _fwd_impl(flat, idxT, wT, meta_f, n_pts=n_pts, window=window_f,
                     nbuf=_default_nbuf())


def _iw_fwd(flat, idxT, wT, meta_f, meta_b, n_pts, n_vox, window_f, window_b):
    out = _fwd_impl(flat, idxT, wT, meta_f, n_pts=n_pts, window=window_f,
                    nbuf=_default_nbuf())
    # zero-size array carries flat's dtype through the residual pytree
    # (a raw np.dtype is not a valid JAX type there)
    return out, (idxT, wT, meta_b, jnp.zeros((0,), flat.dtype))


def _iw_bwd(n_pts, n_vox, window_f, window_b, res, ct):
    idxT, wT, meta_b, dtype_probe = res
    d = _bwd_impl(ct, idxT, wT, meta_b, n_vox=n_vox, window=window_b,
                  nbuf=_default_nbuf())
    return d.astype(dtype_probe.dtype), None, None, None, None


interp_window_apply.defvjp(_iw_fwd, _iw_bwd)


def build_interp_windows(interp_idx: np.ndarray, n_vox: int):
    """Host: both worklists for a batch, or None on overflow (logged)."""
    try:
        return (interp_fwd_jobs(interp_idx, n_vox),
                interp_bwd_jobs(interp_idx, n_vox))
    except WindowOverflow as e:
        logging.warning(
            "windowed interp disabled for this batch (XLA gather/scatter "
            "fallback, retrace): %s", e)
        return None
