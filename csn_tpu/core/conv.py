"""Sparse convolution over precomputed kernel maps (gather-matmul-accumulate).

TPU-native replacement for MinkowskiEngine's C++/CUDA sparse convolution
(gather-GEMM-scatter over kernel maps; used by every model in the reference,
e.g. `MinkowskiNet/models/hrnet.py:39-120`, `models/res16unet.py:31-167`).

The kernel map is an int32 table `[K_off, N_out]` of input-voxel indices into
the flattened `[N_in]` source axis, with sentinel `N_in` for "no neighbor".
Gathers use out-of-bounds fill so sentinels contribute zeros; each offset's
gathered block hits the MXU as a single `[N_out, Cin] @ [Cin, Cout]` matmul.

Performance-critical design (measured on TPU v5e, scripts/microbench.py):

* Backward pass NEVER scatters. Given the *transpose* kernel map (the up map
  for a down conv, the same table with mirrored offsets for a same-level
  conv), d_feats is itself a sparse convolution with transposed weights —
  a gather, which TPUs do ~5-20x faster than scatter-add.
* When Cin < Cout (the k=5 stem conv: 3->32 with 125 offsets), rows are
  transformed *before* the gather (gather [N, Cout] rows instead of tiny
  [N, 3] rows) — HBM reads are row-granular, so wider rows amortize the
  transaction overhead.
* Gathered blocks are rematerialized in backward instead of stored
  (`jax.checkpoint` on the offset scan).

`same`, `down` (strided) and `up` (transposed) convolutions all reduce to this
one primitive — only the kernel map differs (see core/pyramid.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [N, C], idx [...] with sentinel >= N -> zeros."""
    return feats.at[idx].get(mode="fill", fill_value=0)


def _conv_impl(feats, kmap, weights, accum_dtype=jnp.float32,
               remat: bool = False):
    """out[i] = sum_k W[k]^T-applied neighbor rows. Chooses gather-then-
    transform or transform-then-gather based on channel widths.

    `remat=True` wraps the offset-scan body in jax.checkpoint so plain
    autodiff does not store K_off gathered blocks; the custom-vjp path leaves
    it off (nothing differentiates through it) to keep compile time down."""
    n_out = kmap.shape[1]
    cin = feats.shape[-1]
    cout = weights.shape[-1]

    if cin < cout and cin < 16:
        # transform first: h[k] = feats @ W[k]  (cheap: small cin), then
        # gather wide rows. Scan keeps the [K, N, Cout] intermediate out of
        # HBM.
        def body(carry, inputs):
            idx, w = inputs
            h = jnp.dot(feats, w, preferred_element_type=accum_dtype)
            g = _gather_rows(h, idx)
            return carry + g, None

        init = jnp.zeros((n_out, cout), dtype=accum_dtype)
        body_fn = jax.checkpoint(body) if remat else body
        out, _ = jax.lax.scan(body_fn, init, (kmap, weights))
        return out.astype(feats.dtype)

    # One batched gather + einsum: ~20% faster than a scan over offsets on
    # v5e (XLA overlaps the big gather with the matmuls) and much faster to
    # compile (no loop).
    if remat:
        def conv_all(feats):
            g = _gather_rows(feats, kmap)  # [K, N_out, Cin]
            return jnp.einsum("knc,kcd->nd", g, weights,
                              preferred_element_type=accum_dtype)

        out = jax.checkpoint(conv_all)(feats)
    else:
        g = _gather_rows(feats, kmap)
        out = jnp.einsum("knc,kcd->nd", g, weights,
                         preferred_element_type=accum_dtype)
    return out.astype(feats.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def sparse_conv_tvjp(feats, weights, kmap, kmap_t, win_starts, win_starts_t,
                     mirror: bool, win_group: int, win_window: int,
                     win_window_t: int = 512, input_grad: bool = True,
                     win_align: int = 16, win_align_t: int = 16):
    """Sparse conv with an all-gather backward.

    Args:
      feats:   [N_in, Cin]
      weights: [K, Cin, Cout]
      kmap:    [K, N_out] forward neighbor table (sentinel N_in).
      kmap_t:  [K, N_in] transpose table (sentinel N_out): for offset k,
               kmap_t[k][j] = i  <=>  kmap[k][i] = j. For same-level odd
               kernels pass kmap itself with mirror=True (offset o's
               transpose edges live at offset -o = reversed product order).
      mirror:  pair d_out rows of offset k' with W[K-1-k'] (same-level maps).
      win_starts: optional window-job worklist (core/window_conv.py) —
               forward runs the Pallas windowed-gather kernel instead of
               the XLA gather.
      win_starts_t: optional worklist for the TRANSPOSE map — backward runs
               the fused windowed d_feats+dW kernel (for same-level maps
               this is the forward worklist).
    """
    return _conv_fwd_impl(feats, kmap, weights, win_starts, win_group,
                          win_window, win_align)


def _conv_fwd_impl(feats, kmap, weights, win_starts, win_group, win_window,
                   win_align=16):
    if win_starts is not None:
        from csn_tpu.core.window_conv import window_conv_fwd

        return window_conv_fwd(feats, kmap, win_starts, weights,
                               group=win_group, window=win_window,
                               align=win_align)
    return _conv_impl(feats, kmap, weights)


def _tvjp_fwd(feats, weights, kmap, kmap_t, win_starts, win_starts_t, mirror,
              win_group, win_window, win_window_t, input_grad, win_align,
              win_align_t):
    out = _conv_fwd_impl(feats, kmap, weights, win_starts, win_group,
                         win_window, win_align)
    return out, (feats, weights, kmap, kmap_t, win_starts_t)


def _tvjp_bwd(mirror, win_group, win_window, win_window_t, input_grad,
              win_align, win_align_t, res, g):
    feats, weights, kmap, kmap_t, win_starts_t = res
    # weight paired with the transpose-map offset k: mirrored for same-level
    # maps (offset -o lives at index K-1-k in product order), identity for
    # down/up pairs.
    w_for_t = weights[::-1] if mirror else weights

    if win_starts_t is not None:
        # no f32 upcast of g here: the windowed kernel DMAs bf16 windows
        # (window_conv._pad_feats casts), so an upcast would only
        # materialize a dead f32 copy
        # Windowed fused backward over the transpose map's worklist (== the
        # forward worklist for same-level maps). One Pallas pass emits
        # d_feats AND dW — see core/window_conv.py. Stem convs consume raw
        # input data, so their d_feats is dead: dw_only skips those matmuls.
        from csn_tpu.core.window_conv import window_conv_bwd

        d_feats, d_w_t = window_conv_bwd(
            feats, g, kmap_t, win_starts_t, w_for_t, group=win_group,
            window=win_window_t, dw_only=not input_grad,
            align=win_align_t)
        d_w = d_w_t[::-1] if mirror else d_w_t
        return (d_feats.astype(feats.dtype), d_w.astype(weights.dtype),
                None, None, None, None)

    f32 = feats.astype(jnp.float32)
    # ONE gather per offset serves both gradients:
    #   gg      = gather(g, kmap_t[k])                  [N_in, Cout]
    #   d_feats += gg . W_pair[k]^T                     (contract Cout)
    #   d_W[k]  = feats^T . gg                          (contract N_in)
    # (dW identity: sum_i f[kmap[k][i]] g[i]^T == f^T gather(g, kmap_t[k]),
    # because each offset map is a partial permutation.)
    gg = _gather_rows(g, kmap_t)  # [K, N_in, Cout] (one batched gather)
    if input_grad:
        d_feats = jnp.einsum("knd,kcd->nc", gg, w_for_t.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
    else:
        d_feats = jnp.zeros_like(feats, dtype=jnp.float32)
    d_w_t = jnp.einsum("nc,knd->kcd", f32, gg,
                       preferred_element_type=jnp.float32)
    # d_w_t[k] corresponds to transpose-offset k -> un-mirror for same maps.
    d_w = d_w_t[::-1] if mirror else d_w_t

    return (d_feats.astype(feats.dtype), d_w.astype(weights.dtype), None,
            None, None, None)


sparse_conv_tvjp.defvjp(_tvjp_fwd, _tvjp_bwd)


def sparse_conv(
    feats: jnp.ndarray,
    kmap: jnp.ndarray,
    weights: jnp.ndarray,
    kmap_t: jnp.ndarray = None,
    mirror: bool = False,
    win_starts: jnp.ndarray = None,
    win_starts_t: jnp.ndarray = None,
    win_group: int = 3,
    win_window: int = 512,
    win_window_t: int = None,
    input_grad: bool = True,
    win_align: int = 16,
    win_align_t: int = None,
    *,
    accum_dtype=jnp.float32,
) -> jnp.ndarray:
    """Apply a sparse convolution [N_in, Cin] -> [N_out, Cout].

    With `kmap_t` (transpose table), the fast all-gather backward is used;
    without it, plain autodiff (scatter-add backward) applies. `win_starts`
    / `win_starts_t` route forward / backward through the Pallas windowed
    kernels (for same-level maps pass the same worklist for both).
    `input_grad=False` declares the input a gradient-free leaf (stem convs
    on raw data): backward skips the d_feats work and returns zeros.
    """
    if kmap_t is not None:
        if mirror and win_starts_t is None:
            win_starts_t = win_starts
        if win_window_t is None:
            win_window_t = win_window
        if win_align_t is None:
            win_align_t = win_align
        return sparse_conv_tvjp(feats, weights, kmap, kmap_t, win_starts,
                                win_starts_t, mirror, win_group, win_window,
                                win_window_t, input_grad, win_align,
                                win_align_t)
    return _conv_impl(feats, kmap, weights, accum_dtype, remat=True)


def dense_stem_conv(x, cells, weights, grid: int, ksize: int,
                    input_grad: bool = True):
    """Raw-data stem conv as ONE dense 3D convolution on per-shape grids.

    Exact equivalent of the sparse stride-1 conv for low-Cin stems: scatter
    the [B, L0, Cin] voxel features onto per-shape [G, G, G] grids (absent
    cells stay zero, which is exactly what the kernel-map sentinel
    contributes), run `lax.conv_general_dilated` (SAME padding — out-of-grid
    neighbors are zeros, i.e. non-voxels), and gather the occupied cells
    back. At stem widths (Cin=3, k=5^3=125 offsets) this replaces 125
    one-hot gather matmuls with a single MXU-shaped dense conv whose total
    work is bounded by grid_occupancy^-1 (~10-40x) times the useful flops —
    far below the windowed gather's per-offset overhead. Replaces the same
    ME stem `MinkowskiConvolution(kernel_size=5)` (`MinkowskiNet/models/
    hrnet.py:88-96`) the other paths do.

    x [B, L0, Cin]; cells [B, L0, 3] uint8 per-shape grid coords (sentinel
    255 >= G); weights [ksize^3, Cin, Cout] in the x-major offset product
    order of `MapSpec.offsets` — `reshape(k, k, k, Cin, Cout)` IS the dense
    kernel because `lax` convs are cross-correlations with spatial index
    d = idx - k//2, matching offsets {-k//2..k//2} enumerated x-slowest.
    """
    B, L0, cin = x.shape
    cout = weights.shape[-1]
    if not input_grad:
        x = jax.lax.stop_gradient(x)
    if cin < 32:
        # XLA's TPU lowering of tiny-Cin volume convs is pathological
        # (measured 40.8 ms at Cin=3 vs 5.1 ms at Cin=32 for the same
        # [16, 54^3] geometry); zero-padded channels are free MXU lanes
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 32 - cin)))
        weights = jnp.pad(weights, ((0, 0), (0, 32 - cin), (0, 0)))
        cin = 32
    c = cells.astype(jnp.int32)
    cell_id = (c[..., 0] * grid + c[..., 1]) * grid + c[..., 2]  # sentinel ->
    # >= G^3 for any coord 255 (G <= 254), dropped / filled below
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    dense = jnp.zeros((B, grid ** 3, cin), x.dtype)
    # level-0 voxels are unique cells in sorted key order per shape
    dense = dense.at[bidx, cell_id].set(x, mode="drop", unique_indices=True,
                                        indices_are_sorted=True)
    vol = dense.reshape(B, grid, grid, grid, cin)
    w = weights.reshape(ksize, ksize, ksize, cin, cout).astype(x.dtype)
    # no preferred_element_type: an f32 output would hand the conv's grad
    # rule an f32 cotangent against bf16 operands (dtype-mismatch error);
    # XLA's MXU conv accumulates in f32 internally for bf16 inputs, matching
    # the sparse path's f32-accumulate-then-cast semantics.
    out = jax.lax.conv_general_dilated(
        vol, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = out.reshape(B, grid ** 3, cout)
    return out.at[bidx, cell_id].get(mode="fill", fill_value=0,
                                     unique_indices=True,
                                     indices_are_sorted=True)


def sparse_conv_with_bias(feats, kmap, weights, bias, **kw):
    out = sparse_conv(feats, kmap, weights, **kw)
    return out + bias[None, :].astype(out.dtype)


def masked_fill(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows. feats [..., N, C] or [B, L, C]; mask matches
    leading dims."""
    return jnp.where(mask[..., None], feats, 0.0)
