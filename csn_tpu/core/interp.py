"""Voxel -> point readout (trilinear interpolation).

Replaces `soutput.interpolate(queries_field)` in the reference trainers
(`MinkowskiNet/lib/trainer_csn.py:201`, `lib/trainer_seg.py:134`): the network
output lives on stride-1 voxels; the loss/metrics are evaluated at the original
points. Corner indices/weights are precomputed host-side (core/pyramid.py);
here it is a pure gather + weighted sum.
"""

from __future__ import annotations

import jax.numpy as jnp


def decode_interp_idx(interp_idx, point_to_voxel, n0: int):
    """Compact int16 wire deltas -> absolute int32 corner indices (identity
    for int32 tables). Corner index = point's own voxel + small delta;
    sentinel 32767 -> n0 (out-of-range, fill/no-match semantics)."""
    if interp_idx.dtype != jnp.int16:
        return interp_idx
    assert point_to_voxel is not None, \
        "int16 interp_idx needs point_to_voxel to decode"
    d = interp_idx.astype(jnp.int32)
    return jnp.where(d == 32767, n0,
                     point_to_voxel[..., None].astype(jnp.int32) + d)


def interpolate_to_points(
    vox_feats: jnp.ndarray,   # [B, L0, C] (or [N0, C] flattened)
    interp_idx: jnp.ndarray,  # [B, P, 8] int32 into flattened B*L0 (sentinel)
                              # — or int16 wire deltas vs point_to_voxel
    interp_w: jnp.ndarray,    # [B, P, 8] float
    point_to_voxel: jnp.ndarray = None,  # [B, P] — required for int16 idx
) -> jnp.ndarray:
    """Returns [B, P, C] point features."""
    if vox_feats.ndim == 3:
        b, l, c = vox_feats.shape
        flat = vox_feats.reshape(b * l, c)
    else:
        flat = vox_feats
        c = flat.shape[-1]
    interp_idx = decode_interp_idx(interp_idx, point_to_voxel, flat.shape[0])
    g = flat.at[interp_idx].get(mode="fill", fill_value=0)  # [B, P, 8, C]
    w = interp_w.astype(g.dtype)
    return jnp.einsum("bpkc,bpk->bpc", g, w)


def interp_batch(vox_feats: jnp.ndarray, batch) -> jnp.ndarray:
    """`interpolate_to_points(out, batch.interp_idx, ...)` that upgrades to
    the Pallas windowed kernels (core/interp_window.py — MXU one-hot
    matmuls forward, scatter-free backward) when the batch carries the
    'win!interp_*' worklists (spec.sort_points + use_windows)."""
    meta_f = batch.kmaps.get("win!interp_f")
    if meta_f is None:
        return interpolate_to_points(vox_feats, batch.interp_idx,
                                     batch.interp_w, batch.point_to_voxel)
    from csn_tpu.core.interp_window import interp_window_apply

    meta_b = batch.kmaps["win!interp_b"]
    B, L0, C = vox_feats.shape
    idx = decode_interp_idx(batch.interp_idx, batch.point_to_voxel, B * L0)
    P = idx.shape[1]
    idxT = idx.reshape(B * P, 8).T
    wT = batch.interp_w.reshape(B * P, 8).T.astype(jnp.float32)
    out = interp_window_apply(vox_feats.reshape(B * L0, C), idxT, wT,
                              meta_f, meta_b, B * P, B * L0)
    return out.reshape(B, P, C).astype(vox_feats.dtype)


def nearest_voxel_to_points(
    vox_feats: jnp.ndarray,       # [B, L0, C]
    point_to_voxel: jnp.ndarray,  # [B, P] int32 flattened (sentinel)
) -> jnp.ndarray:
    """Nearest (containing-voxel) readout — the ME `slice()` equivalent."""
    b, l, c = vox_feats.shape
    flat = vox_feats.reshape(b * l, c)
    return flat.at[point_to_voxel].get(mode="fill", fill_value=0)
