"""Voxel -> point readout (trilinear interpolation).

Replaces `soutput.interpolate(queries_field)` in the reference trainers
(`MinkowskiNet/lib/trainer_csn.py:201`, `lib/trainer_seg.py:134`): the network
output lives on stride-1 voxels; the loss/metrics are evaluated at the original
points. Corner indices/weights are precomputed host-side (core/pyramid.py);
here it is a pure gather + weighted sum.
"""

from __future__ import annotations

import jax.numpy as jnp


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
    if interp_idx.dtype == jnp.int16:
        # compact wire format (core/pyramid.py to_jax): corner index =
        # point's own voxel + small delta; sentinel 32767 -> out-of-range
        # (mode='fill' handles any value >= N)
        assert point_to_voxel is not None, \
            "int16 interp_idx needs point_to_voxel to decode"
        d = interp_idx.astype(jnp.int32)
        interp_idx = jnp.where(d == 32767, flat.shape[0],
                               point_to_voxel[..., None].astype(jnp.int32)
                               + d)
    g = flat.at[interp_idx].get(mode="fill", fill_value=0)  # [B, P, 8, C]
    w = interp_w.astype(g.dtype)
    return jnp.einsum("bpkc,bpk->bpc", g, w)


def nearest_voxel_to_points(
    vox_feats: jnp.ndarray,       # [B, L0, C]
    point_to_voxel: jnp.ndarray,  # [B, P] int32 flattened (sentinel)
) -> jnp.ndarray:
    """Nearest (containing-voxel) readout — the ME `slice()` equivalent."""
    b, l, c = vox_feats.shape
    flat = vox_feats.reshape(b * l, c)
    return flat.at[point_to_voxel].get(mode="fill", fill_value=0)
