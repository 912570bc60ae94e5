"""flax.linen building blocks over the static-shape sparse voxel engine.

These replace the MinkowskiEngine layer zoo used throughout the reference
models (`ME.MinkowskiConvolution`, `ME.MinkowskiConvolutionTranspose`,
`ME.MinkowskiBatchNorm` / `InstanceNorm` / LayerNorm wrapper, `MinkowskiReLU`,
`MinkowskiSumPooling`; see `MinkowskiNet/models/modules/common.py`,
`models/modules/resnet_block.py`).

Features flow as `[B, L, C]` per stride level with a boolean `[B, L]` mask;
convolutions consume kernel maps by name from a `JaxVoxelBatch` (see
core/pyramid.py). Norm statistics are computed over *valid* voxels only, which
matches ME: its BatchNorm sees exactly the occupied voxels, never padding.
"""

from __future__ import annotations

import enum
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.core.conv import sparse_conv


class NormType(enum.Enum):
    """Mirror of `models/modules/common.py:7-11`."""

    BATCH_NORM = 0
    INSTANCE_NORM = 1
    INSTANCE_BATCH_NORM = 2
    LAYER_NORM = 3


def _conv_kernel_init(key, shape, dtype=jnp.float32):
    """ME-style init: uniform(-s, s) with s = 1/sqrt(fan_in * kernel_volume)."""
    k, cin, cout = shape
    s = 1.0 / jnp.sqrt(jnp.asarray(cin * k, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, minval=-s, maxval=s)


def transpose_map_name(map_name: str) -> Tuple[str, bool]:
    """Transpose kernel-map name + weight-mirror flag for the fast all-gather
    backward (core/conv.py): a same-level odd kernel is its own transpose with
    mirrored offsets; down and up maps of equal kernel size transpose each
    other."""
    if map_name.startswith("same"):
        return map_name, True
    if map_name.startswith("down"):
        return "up" + map_name[4:], False
    if map_name.startswith("up"):
        return "down" + map_name[2:], False
    raise ValueError(map_name)


class SparseConv(nn.Module):
    """Sparse (possibly strided / transposed) convolution.

    `map_name` selects a precomputed kernel map: 'sameNkK' keeps the level,
    'downNkK' moves level N -> N+1 (stride 2), 'upNkK' moves N+1 -> N
    (transpose stride 2). The caller is responsible for passing features of
    the map's source level and using the destination level's mask afterwards.

    When the batch also carries the transpose map, backward runs as pure
    gathers (no scatter-add) via `sparse_conv_tvjp`.
    """

    features: int
    map_name: str
    use_bias: bool = False
    # False for stem convs applied to raw input data: their d_feats has no
    # consumer, so backward computes only dW (saves the per-offset d_feats
    # matmuls in the windowed kernel).
    input_grad: bool = True

    @nn.compact
    def __call__(self, batch, x: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
        from csn_tpu.core.pyramid import decode_kmap

        b, l_in, _ = x.shape
        ksz = int(self.map_name.rsplit("k", 1)[1])
        # Dense-grid stem path (core/conv.py dense_stem_conv): level-0
        # stride-1 odd-kernel convs on raw low-Cin data run as ONE dense 3D
        # conv on per-shape [G,G,G] grids — exact, and far off the one-hot
        # gather's per-offset overhead at Cin < 16.
        if (getattr(batch, "stem_cells", None) is not None
                and self.map_name == f"same0k{ksz}" and ksz % 2 == 1
                and x.shape[-1] < 16):
            from csn_tpu.core.conv import dense_stem_conv

            w = self.param("kernel", _conv_kernel_init,
                           (ksz ** 3, x.shape[-1], self.features))
            out = dense_stem_conv(x, batch.stem_cells, w, batch.stem_grid,
                                  ksz, input_grad=self.input_grad)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                out = out + bias[None, None, :]
            return out
        # int16 wire tables -> absolute int32 indices (XLA CSEs the decode
        # across the many convs sharing one map)
        kmap = decode_kmap(batch.kmaps[self.map_name], b * l_in)
        t_name, mirror = transpose_map_name(self.map_name)
        kmap_t = batch.kmaps.get(t_name)
        if kmap_t is not None and t_name != self.map_name:
            kmap_t = decode_kmap(kmap_t, out_shape[0] * out_shape[1])
        if t_name == self.map_name:
            kmap_t = kmap
        win_starts = batch.kmaps.get("win!" + self.map_name)
        win_starts_t = batch.kmaps.get("win!" + t_name)
        ksize = int(self.map_name.rsplit("k", 1)[1])
        win_group = ksize * ksize  # one window per dx-slab of a cubic kernel
        from csn_tpu.core.window_conv import align_for_map, window_for_map

        win_window = window_for_map(self.map_name)
        win_window_t = window_for_map(t_name)
        cin = x.shape[-1]
        k = kmap.shape[0]
        w = self.param("kernel", _conv_kernel_init, (k, cin, self.features))
        out = sparse_conv(x.reshape(b * l_in, cin), kmap, w, kmap_t=kmap_t,
                          mirror=mirror, win_starts=win_starts,
                          win_starts_t=win_starts_t, win_group=win_group,
                          win_window=win_window, win_window_t=win_window_t,
                          input_grad=self.input_grad,
                          win_align=align_for_map(self.map_name),
                          win_align_t=align_for_map(t_name))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias[None, :]
        b_out, l_out = out_shape
        return out.reshape(b_out, l_out, self.features)


class Conv1x1(nn.Module):
    """Pointwise (kernel-size-1) convolution == per-voxel Linear (ME kernel 1
    convs, e.g. the FC heads `models/hrnet.py:246-262,331-339`)."""

    features: int
    use_bias: bool = True
    # f32=True: cast the INPUT up so the whole matmul runs in f32 — for
    # classifier heads, where bf16 logits (not just a bf16->f32 output cast)
    # would quantize the margin the CE loss sees.
    f32: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # compute in the activation dtype (f32 params cast down; MXU
        # accumulates f32 either way)
        if self.f32:
            x = x.astype(jnp.float32)
        return nn.Dense(self.features, use_bias=self.use_bias, dtype=x.dtype,
                        kernel_init=nn.initializers.variance_scaling(
                            1.0 / 3.0, "fan_in", "uniform"))(x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels of the whole batch (ME.MinkowskiBatchNorm).

    Uses torch momentum semantics: running <- (1-m)*running + m*batch, with the
    reference default m=0.02 (`lib/config.py:63`).
    """

    momentum: float = 0.02
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), self.dtype))

        if train:
            # one fused pass: sum and sum-of-squares reduce together (the
            # two-pass (x-mean)^2 form forces a second HBM sweep because the
            # second reduction depends on the first). Stats accumulate in
            # f32 even for bf16 activations (a 90k-element bf16 sum loses
            # ~3 decimal digits).
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)
            n = jnp.maximum(m.sum(), 1.0)
            xm = xf * m[..., None]
            s1 = xm.sum(axis=(0, 1))
            s2 = (xf * xm).sum(axis=(0, 1))
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                mom = self.momentum
                ra_mean.value = (1.0 - mom) * ra_mean.value + mom * mean
                # torch tracks unbiased running var
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_var.value = (1.0 - mom) * ra_var.value + mom * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        # fold into one multiply-add (f32 per-channel coefficients, applied
        # in the activation dtype): y = x * inv + beta
        inv = jax.lax.rsqrt(var + self.eps) * scale
        beta = bias - mean * inv
        y = x * inv.astype(x.dtype) + beta.astype(x.dtype)
        return jnp.where(mask[..., None], y, 0.0)


class MaskedInstanceNorm(nn.Module):
    """Per-shape, per-channel normalization over valid voxels
    (ME.MinkowskiInstanceNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        m = mask.astype(jnp.float32)[..., None]
        n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        xm = xf * m
        s1 = xm.sum(axis=1, keepdims=True)
        s2 = (xf * xm).sum(axis=1, keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        beta = bias - mean * inv
        y = x * inv.astype(x.dtype) + beta.astype(x.dtype)
        return jnp.where(mask[..., None], y, 0.0)


class SparseLayerNorm(nn.Module):
    """Per-voxel LayerNorm (`models/modules/common.py:29-58`)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # stats in f32 (flax computes in `dtype`); output back in x's dtype
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32)(x)
        return jnp.where(mask[..., None], y.astype(x.dtype), 0.0)


class Norm(nn.Module):
    """Dispatch on NormType (mirror of `get_norm`,
    `models/modules/common.py:14-26`)."""

    norm_type: NormType
    momentum: float = 0.02

    @nn.compact
    def __call__(self, x, mask, train: bool):
        if self.norm_type == NormType.BATCH_NORM:
            return MaskedBatchNorm(momentum=self.momentum)(x, mask, train)
        if self.norm_type == NormType.INSTANCE_NORM:
            return MaskedInstanceNorm()(x, mask, train)
        if self.norm_type == NormType.INSTANCE_BATCH_NORM:
            x = MaskedInstanceNorm()(x, mask, train)
            return MaskedBatchNorm(momentum=self.momentum)(x, mask, train)
        if self.norm_type == NormType.LAYER_NORM:
            return SparseLayerNorm()(x, mask, train)
        raise ValueError(self.norm_type)


def sum_pool(batch, x: jnp.ndarray, map_name: str,
             out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Sum pooling via a down kernel map (ME.MinkowskiSumPooling,
    `models/resnet.py:42-46`)."""
    from csn_tpu.core.pyramid import decode_kmap

    b, l_in, c = x.shape
    # int16 wire tables -> absolute indices (same contract as SparseConv
    # above; the raw compact wire holds per-tile deltas, not row indices)
    kmap = decode_kmap(batch.kmaps[map_name], b * l_in)
    flat = x.reshape(b * l_in, c)
    g = flat.at[kmap].get(mode="fill", fill_value=0)  # [K, N_out, C]
    out = g.sum(axis=0)
    b_out, l_out = out_shape
    return out.reshape(b_out, l_out, c)


def global_avg_pool(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L, C] -> [B, C] masked mean (f32 accumulation and output: the
    result feeds the compatibility-weight head, and a 5k-element bf16 sum
    is too coarse there)."""
    m = mask.astype(jnp.float32)[..., None]
    n = jnp.maximum(m.sum(axis=1), 1.0)
    return (x.astype(jnp.float32) * m).sum(axis=1) / n


def global_max_pool(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L, C] -> [B, C] masked max."""
    neg = jnp.finfo(x.dtype).min
    return jnp.where(mask[..., None], x, neg).max(axis=1)


def relu_masked(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask[..., None], jax.nn.relu(x), 0.0)
