"""Sparse convolution over precomputed kernel maps (gather-matmul-accumulate).

TPU-native replacement for MinkowskiEngine's C++/CUDA sparse convolution
(gather-GEMM-scatter over kernel maps; used by every model in the reference,
e.g. `MinkowskiNet/models/hrnet.py:39-120`, `models/res16unet.py:31-167`).

The kernel map is an int32 table `[K_off, N_out]` of input-voxel indices into
the flattened `[N_in]` source axis, with sentinel `N_in` for "no neighbor".
Gathers use out-of-bounds fill so sentinels contribute zeros; each offset's
gathered block hits the MXU as a single `[N_out, Cin] @ [Cin, Cout]` matmul.

`same`, `down` (strided) and `up` (transposed) convolutions all reduce to this
one primitive — only the kernel map differs (see core/pyramid.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, C], idx [...] with sentinel >= N -> zeros."""
    return feats.at[idx].get(mode="fill", fill_value=0)


def sparse_conv(
    feats: jnp.ndarray,
    kmap: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    Args:
      feats:   [N_in, Cin] flattened source features (padded rows are zero).
      kmap:    [K_off, N_out] int32 neighbor table (sentinel = N_in).
      weights: [K_off, Cin, Cout].

    Returns [N_out, Cout].
    """
    K = kmap.shape[0]
    n_out = kmap.shape[1]
    cout = weights.shape[-1]

    def body(carry, inputs):
        idx, w = inputs
        g = _gather_rows(feats, idx)  # [N_out, Cin]
        out = jnp.dot(g, w, preferred_element_type=accum_dtype)
        return carry + out, None

    init = jnp.zeros((n_out, cout), dtype=accum_dtype)
    out, _ = jax.lax.scan(body, init, (kmap, weights))
    return out.astype(feats.dtype)


def sparse_conv_with_bias(feats, kmap, weights, bias, **kw):
    out = sparse_conv(feats, kmap, weights, **kw)
    return out + bias[None, :].astype(out.dtype)


def masked_fill(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows. feats [..., N, C] or [B, L, C]; mask matches
    leading dims."""
    return jnp.where(mask[..., None], feats, 0.0)
