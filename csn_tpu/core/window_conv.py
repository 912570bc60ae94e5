"""Windowed sparse convolution (Pallas): MXU one-hot gathers over
sequentially-DMA'd index windows.

Why: XLA's row-granular dynamic gather moves ~33-40 GB/s on v5e for 256-byte
rows (scripts/microbench.py) — HBM transactions are much wider than a voxel
row, so the sparse conv is transaction-bound, not bandwidth-bound. But the
voxel lists are built in spatially-sorted order (core/pyramid.py packs keys
x-major), so for every kernel offset the source rows of a contiguous output
tile fall inside a narrow index *window*. This kernel exploits that, the TPU
translation of Minuet-style gather coalescing (PAPERS.md):

  for each output tile (T=256 rows) x offset k:
    - DMA the contiguous source window  feats[start : start+W]   (sequential,
      full HBM bandwidth; double-buffered against compute)
    - gather inside VMEM as a one-hot matmul on the MXU:
        onehot[i, j] = (kmap[k, tile_i] - start == j)      [T, W]  bf16
        g = onehot @ window                                 [T, C]
    - accumulate g @ weights[k]

The host precomputes per-(tile, offset) window starts and verifies every
window fits W (core/pyramid.py attaches the metadata; `window_meta` below);
maps whose spread exceeds W fall back to the plain gather path.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256          # output rows per grid step
WINDOW = 1024       # source rows DMA'd per (tile, offset)


def window_meta(kmap: np.ndarray, n_in: int, tile: int = TILE,
                window: int = WINDOW, group: int = 1) -> Optional[np.ndarray]:
    """Per-(tile, offset-group) window starts [n_tiles, K//group] int32, or
    None if any group's index spread does not fit `window`.

    `group` merges consecutive offsets into one shared window: for a cubic
    kernel the last axis varies fastest, so the `ksize` offsets that differ
    only in dz index near-identical source ranges (sorted voxel order is
    z-fastest) — one window serves all of them (group=ksize)."""
    K, n_out = kmap.shape
    if n_out % tile != 0 or K % group != 0:
        return None
    n_tiles = n_out // tile
    ng = K // group
    hi_cap = max(n_in - window, 0)
    # [ng, group, n_tiles, tile] -> per (tile, group) min/max of valid rows
    t_idx = kmap.reshape(ng, group, n_tiles, tile)
    valid = t_idx < n_in
    big = np.where(valid, t_idx, np.iinfo(np.int32).max)
    small = np.where(valid, t_idx, -1)
    lo = big.min(axis=(1, 3)).T        # [n_tiles, ng]
    hi = small.max(axis=(1, 3)).T
    any_valid = valid.any(axis=(1, 3)).T
    if np.any(any_valid & (hi - lo >= window)):
        return None
    starts = np.where(any_valid, np.minimum(lo, hi_cap), 0).astype(np.int32)
    return starts


def _wconv_kernel_grouped(starts_ref,    # scalar prefetch [n_tiles * NG]
                          kmap_ref,      # [K, TILE] int32 (block per tile)
                          feats_hbm,     # [N_pad, C] in HBM
                          w_ref,         # [K, C, Cout] VMEM
                          out_ref,       # [TILE, Cout]
                          win_scratch, acc_scratch, sem,
                          *, K: int, group: int, window: int, n_in: int,
                          nbuf: int = 2):
    t = pl.program_id(0)
    ng = K // group
    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def get_dma(slot, g):
        start = starts_ref[t * ng + g]
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :],
            win_scratch.at[slot],
            sem.at[slot],
        )

    # prefetch depth nbuf-1
    for w0 in range(min(nbuf - 1, ng)):
        get_dma(w0, w0).start()

    def body(g, _):
        slot = jax.lax.rem(g, nbuf)
        nxt_g = g + nbuf - 1

        @pl.when(nxt_g < ng)
        def _():
            get_dma(jax.lax.rem(nxt_g, nbuf), nxt_g).start()

        get_dma(slot, g).wait()
        start = starts_ref[t * ng + g]
        win_bf = win_scratch[slot].astype(jnp.bfloat16)

        def inner(j, _):
            k = g * group + j
            rows = kmap_ref[k, :]
            rel = rows - start
            cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, window), 1)
            one_bits = jnp.int32(0x3F800000)
            hit = jnp.where(rel[:, None] == cols, one_bits, 0)
            valid_row = jnp.where(rows < n_in, one_bits, 0)
            onehot = pltpu.bitcast(hit & valid_row[:, None],
                                   jnp.float32).astype(jnp.bfloat16)
            gthr = jax.lax.dot_general(
                onehot, win_bf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            acc_scratch[...] += jax.lax.dot_general(
                gthr.astype(jnp.bfloat16), w_ref[k].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return ()

        jax.lax.fori_loop(0, group, inner, (), unroll=True)
        return ()

    jax.lax.fori_loop(0, ng, body, (), unroll=False)
    out_ref[...] = acc_scratch[...].astype(out_ref.dtype)


def window_conv_grouped(feats, kmap, starts, weights, *, group: int,
                        window: int = WINDOW, nbuf: int = 2):
    """Grouped windowed conv: one DMA'd window serves `group` consecutive
    offsets (the dz neighbors of a cubic kernel); `nbuf` window buffers
    give a prefetch depth of nbuf-1."""
    n_in, cin = feats.shape
    K, n_out = kmap.shape
    cout = weights.shape[-1]
    n_tiles = n_out // TILE
    assert n_out % TILE == 0 and K % group == 0

    cpad = (-cin) % 128
    pad = max(window - n_in, 0)
    feats_p = jnp.pad(feats, ((0, pad), (0, cpad)))
    weights = jnp.pad(weights, ((0, 0), (0, cpad), (0, 0)))
    cin = cin + cpad

    kern = functools.partial(_wconv_kernel_grouped, K=K, group=group,
                             window=window, n_in=n_in, nbuf=nbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, TILE), lambda t, s: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda t, s: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, window, cin), feats.dtype),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), feats.dtype),
    )(starts.reshape(-1), kmap, feats_p, weights)
    return out


def _wconv_kernel(starts_ref,            # scalar prefetch [n_tiles * K]
                  kmap_ref,              # [K, TILE] int32 (block per tile)
                  feats_hbm,             # [N_pad, C] in ANY/HBM
                  w_ref,                 # [K, C, Cout] VMEM
                  out_ref,               # [TILE, Cout]
                  win_scratch, acc_scratch, sem,
                  *, K: int, window: int, n_in: int):
    t = pl.program_id(0)
    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def get_dma(slot, k):
        start = starts_ref[t * K + k]
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window), :],
            win_scratch.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < K)
        def _():
            get_dma(nxt, k + 1).start()

        get_dma(slot, k).wait()

        start = starts_ref[t * K + k]
        rows = kmap_ref[k, :]                        # [TILE] int32
        rel = rows - start                           # out-of-window/sentinel
        # One-hot [TILE, W] built as float BITS via integer ops + bitcast:
        # an i1->bf16 select trips a Mosaic relayout limitation, and any
        # int->float convert downstream of an iota gets canonicalized into
        # an (invalid) f32 iota. Integer select of 1.0f's bit pattern avoids
        # both.
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, window), 1)
        one_bits = jnp.int32(0x3F800000)  # bits of 1.0f
        hit = jnp.where(rel[:, None] == cols, one_bits, 0)
        valid_row = jnp.where(rows < n_in, one_bits, 0)
        onehot = pltpu.bitcast(hit & valid_row[:, None],
                               jnp.float32).astype(jnp.bfloat16)
        # precision=DEFAULT: a global f32 matmul-precision setting would
        # otherwise force fp32 contract precision onto bf16 operands, which
        # Mosaic rejects ("Bad lhs type").
        g = jax.lax.dot_general(
            onehot, win_scratch[slot].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)      # [TILE, C]
        acc_scratch[...] += jax.lax.dot_general(
            g.astype(jnp.bfloat16), w_ref[k].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, K, body, (), unroll=False)
    out_ref[...] = acc_scratch[...].astype(out_ref.dtype)


def window_conv(feats: jnp.ndarray, kmap: jnp.ndarray, starts: jnp.ndarray,
                weights: jnp.ndarray, *, window: int = WINDOW) -> jnp.ndarray:
    """feats [N_in, C], kmap [K, N_out], starts [n_tiles, K],
    weights [K, C, Cout] -> [N_out, Cout]."""
    n_in, cin = feats.shape
    K, n_out = kmap.shape
    cout = weights.shape[-1]
    n_tiles = n_out // TILE
    assert n_out % TILE == 0

    # Window DMA slices must be 128-lane aligned: pad channels to 128.
    cpad = (-cin) % 128
    pad = max(window - n_in, 0)
    feats_p = jnp.pad(feats, ((0, pad), (0, cpad)))
    weights = jnp.pad(weights, ((0, 0), (0, cpad), (0, 0)))
    cin = cin + cpad

    kern = functools.partial(_wconv_kernel, K=K, window=window, n_in=n_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, TILE), lambda t, s: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda t, s: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin), feats.dtype),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), feats.dtype),
    )(starts.reshape(-1), kmap, feats_p, weights)
    return out
