"""Pallas TPU flash attention (masked, online-softmax).

The hot SSA/CSA kernel: blocked attention over padded per-shape point sets
with no materialized [Lq, Lk] score matrix, accumulating in VMEM and keeping
both matmuls on the MXU. Grid = (batch*heads, q-blocks, kv-blocks) with the
kv dimension innermost; running max / denominator / output accumulator live in
VMEM scratch across kv iterations (TPU grids execute sequentially per core).

Forward runs the Pallas kernel; backward (custom_vjp) recomputes through the
XLA online-softmax path (`ops/attention.py:online_attention`), which is
memory-safe and exact. Used via `MultiHeadAttention(use_flash=True)`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
                  m_scratch, l_scratch, acc_scratch, *, temperature: float,
                  num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # bf16 operands -> single-pass MXU; f32 accumulation.
    q = (q_ref[0].astype(jnp.float32) * (1.0 / temperature)).astype(
        jnp.bfloat16)                           # [BQ, D]
    k = k_ref[0].astype(jnp.bfloat16)           # [BK, D]
    v = v_ref[0].astype(jnp.bfloat16)           # [BK, D]
    msk = mask_ref[0, 0]                        # [BK] bool/int

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # [BQ, BK]
    s = jnp.where(msk[None, :] != 0, s, NEG_INF)

    m_prev = m_scratch[:, :1]                   # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    scale = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                      # [BQ, BK]
    l_new = l_scratch[:, :1] * scale + jnp.sum(p, axis=1, keepdims=True)

    acc_scratch[...] = acc_scratch[...] * scale + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scratch[:, :1], 1e-30)
        out_ref[0] = (acc_scratch[...] / denom).astype(out_ref.dtype)


def _flash_forward(q, k, v, kv_mask, temperature: float,
                   block_q: int = 512, block_k: int = 1024):
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[-1]

    block_q = min(block_q, max(8, lq))
    block_k = min(block_k, max(128, lk))
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    if kv_mask is None:
        m = jnp.ones((b, lk), dtype=jnp.int32)
    else:
        m = kv_mask.astype(jnp.int32)
    mp = jnp.pad(m, ((0, 0), (0, pad_k)))[:, None, :]  # [B, 1, Lk]

    lqp, lkp = lq + pad_q, lk + pad_k
    qf = qp.reshape(b * h, lqp, dk)
    kf = kp.reshape(b * h, lkp, dk)
    vf = vp.reshape(b * h, lkp, dv)

    nq = lqp // block_q
    nk = lkp // block_k

    grid = (b * h, nq, nk)
    kernel = functools.partial(_flash_kernel, temperature=temperature,
                               num_k_blocks=nk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki: (bh // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv),
                               lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, dv), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
    )(qf, kf, vf, mp)
    return out.reshape(b, h, lqp, dv)[:, :, :lq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, kv_mask=None, temperature: float = 1.0):
    """[B, H, Lq, Dk] x [B, H, Lk, Dk] x [B, H, Lk, Dv] -> [B, H, Lq, Dv]."""
    return _flash_forward(q, k, v, kv_mask, temperature)


def _fwd(q, k, v, kv_mask, temperature):
    out = _flash_forward(q, k, v, kv_mask, temperature)
    return out, (q, k, v, kv_mask)


def _bwd(temperature, res, g):
    from csn_tpu.ops.attention import online_attention

    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q, k, v: online_attention(q, k, v, kv_mask,
                                         temperature=temperature),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
