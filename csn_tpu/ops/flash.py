"""Pallas TPU flash attention (masked, online-softmax), forward + backward.

The hot SSA/CSA kernel: blocked attention over padded per-shape point sets
with no materialized [Lq, Lk] score matrix, accumulating in VMEM and keeping
both matmuls on the MXU (bf16 operands, f32 accumulation).

* Forward: grid (batch*heads, q-blocks, kv-blocks), kv innermost; running
  max / denominator / output accumulator in VMEM scratch (TPU grids execute
  sequentially per core). Also emits the log-sum-exp rows for backward.
* Backward: ONE fused kernel, grid (batch*heads, kv-blocks, q-blocks),
  recomputing the score block from q/k and the saved lse. dK/dV accumulate
  per-kv-block in VMEM scratch; dQ accumulates into a VMEM-resident
  [Lq, D] output plane (block index constant per batch*head) — unlike the
  classic two-kernel flash split there is no second pass recomputing
  s/p/dp for dQ, just one extra ds @ k matmul per block visit.
* Dropout (attention-weight dropout, torch semantics dropout(softmax(s))@v)
  runs inside the kernels with the TPU PRNG; bits come in fixed 128-wide kv
  chunks seeded by the ABSOLUTE (batch*head, q-block, kv-chunk) position,
  so forward and backward reproduce the same mask even though they use
  different kv block sizes (see _drop_mask). The flash identity applies:
  the numerator is dropped, the denominator is not — exactly
  p_ij * m_ij / keep.

Replaces both the per-batch-element attention loop of the reference
(`MinkowskiNet/models/hrnet.py:378-410`) and MID-FC's 20x500 chunking
(`MID-FC/csa_models.py:83-125`).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


@contextlib.contextmanager
def interpret_mode():
    """Force every `pl.pallas_call` in scope to `interpret=True`: the Mosaic
    kernels run through the Pallas interpreter, so CPU-mesh tests and the
    driver's virtual-device dryrun can execute the flash / ring-flash paths
    without TPU hardware. The ONE shared definition (used by
    tests/test_ring_flash.py and __graft_entry__.dryrun_multichip) — keep
    the monkeypatch in a single place so an upstream change to the
    interpret kwarg is fixed once."""
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        yield
    finally:
        pl.pallas_call = orig


def _drop_mask(seed_ref, bh, qi, kc0, shape, keep: float):
    """Deterministic dropout keep-mask for a [block_q, block_k] tile whose
    kv range starts at absolute 128-lane chunk `kc0`.

    Bits are generated in fixed 128-wide kv chunks, each seeded by the
    ABSOLUTE (bh, q-block, kv-chunk) position — NOT by the kv block index.
    This makes the mask invariant to the kv block size, which is load-
    bearing: forward and backward use different block_k (1024 vs 768 — the
    fused backward's VMEM budget), and a block-shaped raster would make the
    backward drop different entries than the forward did. That mismatch is
    not a tolerance issue but a biased gradient: it sent real training NaN
    within ~50 iterations. (q blocks are the same size in both passes, so
    `qi` can stay a block index.)

    Two seed words only: the traced step seed and the folded position (this
    Mosaic version supports at most two; int32-overflow mixing is avoided —
    qi < 769 q-blocks and kv chunks < 769 per q block stay collision-free).
    """
    nchunks = shape[1] // 128
    thresh = jnp.uint32(int(keep * float(2 ** 32 - 1)))
    cols = []
    for i in range(nchunks):
        pltpu.prng_seed(seed_ref[0, 0], bh * 1000003 + qi * 769 + kc0 + i)
        # prng_random_bits yields *signed* int32 on this stack; bitcast
        # before comparing, or the signed compare keeps ~everything.
        bits = pltpu.bitcast(pltpu.prng_random_bits((shape[0], 128)),
                             jnp.uint32)
        cols.append(bits < thresh)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, qmask_ref, out_ref,
                lse_ref, m_scratch, l_scratch, acc_scratch, *,
                temperature: float, num_k_blocks: int, dropout: float):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    msk = mask_ref[0, 0]
    # Block skipping: shapes occupy ~50-80% of the padded cap, so a large
    # fraction of (q-block, kv-block) pairs is pure padding. A fully masked
    # kv block contributes nothing (its probs renormalize away); a fully
    # masked q block's rows are zeroed by the caller. Skipping both cuts MXU
    # *and* (dominant) VPU softmax work; backward skips the same pairs.
    live = jnp.logical_and(jnp.any(msk != 0), jnp.any(qmask_ref[0, 0] != 0))

    @pl.when(live)
    def _compute():
        # bf16 operands + explicit DEFAULT precision (a global f32 matmul
        # precision would force fp32 contract precision onto bf16 operands,
        # which Mosaic rejects).
        q = (q_ref[0].astype(jnp.float32) * (1.0 / temperature)).astype(
            jnp.bfloat16)
        k = k_ref[0].astype(jnp.bfloat16)
        v = v_ref[0].astype(jnp.bfloat16)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        s = jnp.where(msk[None, :] != 0, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        scale = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_scratch[:, :1] * scale + jnp.sum(p, axis=1, keepdims=True)

        if dropout > 0.0:
            keep = 1.0 - dropout
            dm = _drop_mask(seed_ref, bh, qi,
                            ki * (p.shape[1] // 128), p.shape, keep)
            p_num = jnp.where(dm, p * (1.0 / keep), 0.0)
        else:
            p_num = p

        acc_scratch[...] = acc_scratch[...] * scale + jax.lax.dot_general(
            p_num.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scratch[:, :1], 1e-30)
        out_ref[0] = (acc_scratch[...] / denom).astype(out_ref.dtype)
        lse_ref[0, 0] = (m_scratch[:, 0]
                         + jnp.log(jnp.maximum(l_scratch[:, 0], 1e-30)))


def _check_drop_seed_bounds(lqp: int, lkp: int, block_q: int):
    """The dropout seed fold (bh*1000003 + qi*769 + kv_chunk) is collision-
    free only while every q row sees < 769 absolute 128-wide kv chunks
    (lkp < 769*128 ~ 98k) and the qi term stays under the bh stride. A
    larger geometry would silently correlate dropout masks across positions
    (a biased gradient, the exact failure class of the block-raster bug in
    STATUS.md) — fail loudly instead."""
    n_chunks = lkp // 128
    n_qblocks = lqp // block_q
    if n_chunks >= 769 or n_qblocks * 769 + n_chunks >= 1000003:
        raise ValueError(
            f"flash dropout seed folding cannot address this geometry "
            f"(lkp={lkp} -> {n_chunks} kv chunks, {n_qblocks} q blocks); "
            f"widen the fold in _drop_mask before running at this scale")


def fwd_vmem_budget(dk_dim, dv, block_q, block_k, n_tmp: int = 3):
    """Scoped-VMEM request for the forward kernel: q/k/v/out/mask blocks
    with 2x pipelining headroom, the m/l/acc scratch, and the
    [block_q, block_k] f32 stack temporaries (s, p, dropout mask), floored
    at the 16 MB default."""
    blocks = (block_q * (dk_dim + dv)            # q block + out block
              + block_k * (dk_dim + dv)          # k + v blocks
              + 2 * block_k + 2 * block_q)       # masks + lse out
    scratch = (2 * block_q * 128 + block_q * dv) * 4
    tmps = n_tmp * block_q * block_k * 4
    return max(16 * 1024 * 1024, 4 * blocks * 4 + scratch + tmps + (1 << 20))


def weakest_vmem_budget(lqp, dk_dim, dv, block_q, block_k, n_tmp: int = 5):
    """Scoped-VMEM request for the fused backward: all live buffers with 2x
    pipelining headroom, plus the [block_q, block_k] f32 kernel stack
    temporaries (s, p, dp, ds, dropout mask — `n_tmp` planes, not double-
    buffered: they live in the compute stage only), floored at 16 MB."""
    blocks = (block_q * (dk_dim + dv)            # q, do
              + block_k * (dk_dim + dv) * 2      # k, v + dk, dv out
              + 4 * block_q + 2 * block_k        # lse, delta, masks
              + lqp * dk_dim)                    # f32 dq accumulator scratch
    tmps = n_tmp * block_q * block_k * 4
    dq_out_plane = lqp * dk_dim * 4              # resident dq out (<= f32)
    return max(16 * 1024 * 1024,
               4 * blocks * 4 + tmps + dq_out_plane + (1 << 20))


def _pad_to(x, axis, block):
    pad = (-x.shape[axis]) % block
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def _prep(q, k, v, kv_mask, q_mask, block_q, block_k):
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[-1]
    # Hardware-aligned block sizes: sublane multiples (8) on the q axis, lane
    # multiples (128) on the kv axis — Mosaic may reject or mis-tile odd
    # blocks (e.g. lq=500 from the MID-FC 500-point chunks). Padding below
    # absorbs the remainder.
    block_q = min(block_q, max(8, lq))
    block_q = -(-block_q // 8) * 8
    block_k = min(block_k, max(128, lk))
    block_k = -(-block_k // 128) * 128
    qp, pad_q = _pad_to(q, 2, block_q)
    kp, pad_k = _pad_to(k, 2, block_k)
    vp, _ = _pad_to(v, 2, block_k)
    if kv_mask is None:
        m = jnp.ones((b, lk), dtype=jnp.int32)
    else:
        m = kv_mask.astype(jnp.int32)
    mp, _ = _pad_to(m, 1, block_k)
    mp = mp[:, None, :]
    if q_mask is None:
        qm = jnp.ones((b, lq), dtype=jnp.int32)
    else:
        qm = q_mask.astype(jnp.int32)
    qmp, _ = _pad_to(qm, 1, block_q)
    qmp = qmp[:, None, :]
    lqp, lkp = lq + pad_q, lk + pad_k
    return (qp.reshape(b * h, lqp, dk), kp.reshape(b * h, lkp, dk),
            vp.reshape(b * h, lkp, dv), mp, qmp, block_q, block_k, lqp, lkp)


def _block_override(name: str, default: int) -> int:
    """CSN_FLASH_{FQ,FK,BQ,BK} env overrides for block-size A/Bs (read at
    trace time, same caching semantics as the other CSN_* knobs)."""
    import os

    return int(os.environ.get(name, default))


def _flash_forward(q, k, v, kv_mask, q_mask, temperature: float,
                   dropout: float = 0.0, seed=None,
                   block_q: int = None, block_k: int = None):
    # block_k 1024: 512 would avoid the k/v pad to 6144 at the L0 cap
    # (~1.2 ms of pad+slice), but the extra per-block overhead measured
    # worse end-to-end (281 vs 275 ms/step).
    # fwd block_k 2048 (A/B 2026-08-18, B=16 L0 micro: fwd 16.7 -> 15.8,
    # fwd+bwd 35.2 -> 34.3 ms; block_q 1024 was a wash and 1024+2048
    # together blow scoped VMEM): fewer grid steps on the kv axis amortize
    # the per-block m/l bookkeeping. The explicit vmem_limit below keeps
    # larger head dims (MID-FC dk=128) from tripping the 16 MB default.
    block_q = _block_override("CSN_FLASH_FQ", block_q or 512)
    block_k = _block_override("CSN_FLASH_FK", block_k or 2048)
    b, h, lq, dk = q.shape
    dv = v.shape[-1]
    qf, kf, vf, mp, qmp, block_q, block_k, lqp, lkp = _prep(
        q, k, v, kv_mask, q_mask, block_q, block_k)
    nq, nk = lqp // block_q, lkp // block_k
    if dropout > 0.0:
        _check_drop_seed_bounds(lqp, lkp, block_q)

    kernel = functools.partial(_fwd_kernel, temperature=temperature,
                               num_k_blocks=nk, dropout=dropout)
    seed_arr = (jnp.zeros((1, 1), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1, 1))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, dk), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki: (bh // h, 0, ki)),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, ki: (bh // h, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lqp, dv), v.dtype),
            jax.ShapeDtypeStruct((b * h, 1, lqp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fwd_vmem_budget(dk, dv, block_q, block_k)),
    )(seed_arr, qf, kf, vf, mp, qmp)
    return (out.reshape(b, h, lqp, dv)[:, :, :lq, :],
            lse.reshape(b, h, lqp)[:, :, :lq])


# ---------------------------------------------------------------------------
# carry-in / carry-out forward (ring attention per-block kernel)
# ---------------------------------------------------------------------------

def _fwd_carry_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, qmask_ref,
                      m_in_ref, l_in_ref, acc_in_ref,
                      m_out_ref, l_out_ref, acc_out_ref,
                      m_scratch, l_scratch, acc_scratch, *,
                      temperature: float, num_k_blocks: int, dropout: float):
    """`_fwd_kernel` with EXTERNAL online-softmax state: the (m, l, acc)
    accumulators initialize from carry inputs instead of (-inf, 0, 0) and are
    emitted raw (un-normalized) instead of finalized — so a sequence of calls
    over disjoint kv blocks (e.g. blocks arriving over an ICI ring,
    ops/attention.py ring_attention) composes into exactly one flash pass
    over their union. The caller normalizes acc/l (and forms lse) once at the
    end."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.broadcast_to(m_in_ref[0, 0][:, None],
                                          m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_in_ref[0, 0][:, None],
                                          l_scratch.shape)
        acc_scratch[...] = acc_in_ref[0].astype(jnp.float32)

    msk = mask_ref[0, 0]
    live = jnp.logical_and(jnp.any(msk != 0), jnp.any(qmask_ref[0, 0] != 0))

    @pl.when(live)
    def _compute():
        q = (q_ref[0].astype(jnp.float32) * (1.0 / temperature)).astype(
            jnp.bfloat16)
        k = k_ref[0].astype(jnp.bfloat16)
        v = v_ref[0].astype(jnp.bfloat16)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        s = jnp.where(msk[None, :] != 0, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        scale = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_scratch[:, :1] * scale + jnp.sum(p, axis=1, keepdims=True)

        if dropout > 0.0:
            keep = 1.0 - dropout
            dm = _drop_mask(seed_ref, bh, qi,
                            ki * (p.shape[1] // 128), p.shape, keep)
            p_num = jnp.where(dm, p * (1.0 / keep), 0.0)
        else:
            p_num = p

        acc_scratch[...] = acc_scratch[...] * scale + jax.lax.dot_general(
            p_num.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        m_out_ref[0, 0] = m_scratch[:, 0]
        l_out_ref[0, 0] = l_scratch[:, 0]
        acc_out_ref[0] = acc_scratch[...]


def flash_carry_init(b: int, h: int, lq: int, dv: int):
    """Fresh (m, l, acc) carry for `flash_forward_carry` — the same
    (-inf, 0, 0) state `_fwd_kernel` initializes internally."""
    return (jnp.full((b, h, lq), NEG_INF, jnp.float32),
            jnp.zeros((b, h, lq), jnp.float32),
            jnp.zeros((b, h, lq, dv), jnp.float32))


def flash_carry_finalize(carry):
    """(m, l, acc) -> (out [B,H,Lq,Dv] f32, lse [B,H,Lq]). Matches
    `_fwd_kernel`'s finalize (denominator floored at 1e-30)."""
    m, l, acc = carry
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return out, lse


def flash_forward_carry(q, k, v, kv_mask, q_mask, carry,
                        temperature: float, dropout: float = 0.0, seed=None,
                        block_q: int = None, block_k: int = None):
    """One flash pass over THIS kv block, continuing the online-softmax state
    in `carry` = (m [B,H,Lq], l [B,H,Lq], acc [B,H,Lq,Dv]), all f32. Returns
    the updated carry (un-normalized — see flash_carry_finalize).

    This is the per-ring-block kernel for `ring_attention(use_flash=True)`:
    n chips' kv shards chained through the carry compute exactly the single-
    chip flash result over the global key set. NOT differentiable on its own
    (no VJP) — the ring wraps the whole hop sequence in one custom_vjp whose
    backward re-rings the blocks through `flash_block_backward`."""
    block_q = _block_override("CSN_FLASH_FQ", block_q or 512)
    block_k = _block_override("CSN_FLASH_FK", block_k or 2048)
    b, h, lq, dk = q.shape
    dv = v.shape[-1]
    qf, kf, vf, mp, qmp, block_q, block_k, lqp, lkp = _prep(
        q, k, v, kv_mask, q_mask, block_q, block_k)
    nq, nk = lqp // block_q, lkp // block_k
    if dropout > 0.0:
        _check_drop_seed_bounds(lqp, lkp, block_q)

    m_in, l_in, acc_in = carry
    # pad carries along lq to the padded plane (padded q rows: junk by
    # contract; NEG_INF/0 keeps them NaN-free)
    m_f = m_in.reshape(b * h, 1, lq)
    l_f = l_in.reshape(b * h, 1, lq)
    if lqp != lq:
        padw = ((0, 0), (0, 0), (0, lqp - lq))
        m_f = jnp.pad(m_f, padw, constant_values=NEG_INF)
        l_f = jnp.pad(l_f, padw)
    acc_f, _ = _pad_to(acc_in.reshape(b * h, lq, dv), 1, block_q)

    kernel = functools.partial(_fwd_carry_kernel, temperature=temperature,
                               num_k_blocks=nk, dropout=dropout)
    seed_arr = (jnp.zeros((1, 1), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1, 1))
    m_o, l_o, acc_o = pl.pallas_call(
        kernel,
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, dk), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki: (bh // h, 0, ki)),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, ki: (bh // h, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            pl.BlockSpec((1, block_q, dv), lambda bh, qi, ki: (bh, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, ki: (bh, 0, qi)),
            pl.BlockSpec((1, block_q, dv), lambda bh, qi, ki: (bh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, 1, lqp), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 1, lqp), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lqp, dv), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fwd_vmem_budget(dk, dv, block_q, block_k)),
    )(seed_arr, qf, kf, vf, mp, qmp, m_f, l_f, acc_f)
    return (m_o.reshape(b, h, lqp)[:, :, :lq],
            l_o.reshape(b, h, lqp)[:, :, :lq],
            acc_o.reshape(b, h, lqp, dv)[:, :, :lq, :])


def flash_block_backward(q, k, v, kv_mask, out, lse, g, temperature: float,
                         dropout: float = 0.0, seed=None):
    """Per-kv-block backward for the ring: given the GLOBAL (out, lse, g) and
    one kv block, returns (dq_contribution, dk_block, dv_block). Summing
    dq over blocks and keeping dk/dv per block is exactly the full flash
    backward split across the ring. dq comes back f32 for safe cross-hop
    accumulation."""
    dq, dk, dv = _flash_backward(q.astype(jnp.float32), k, v, kv_mask, None,
                                 out, lse, g, temperature, dropout, seed)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_fused_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, mask_ref, qmask_ref, dk_ref, dv_ref, dq_ref,
                      dk_scratch, dv_scratch, dq_scratch, *,
                      temperature: float, num_q_blocks: int,
                      num_k_blocks: int, block_q: int, dropout: float):
    """ONE backward pass emits dK, dV AND dQ.

    Grid (bh, ki, qi). The classic flash split runs a second (bh, qi, ki)
    kernel for dQ that recomputes s/p/dp from scratch; here dQ accumulates
    in a VMEM-resident [lqp, D] f32 scratch plane and each (ki, qi) visit
    adds its ds @ k contribution — one extra matmul instead of a whole
    second pass (~35% of backward time). The plane is cast+flushed to the
    (possibly bf16) dq output once per bh at the last grid step."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

        @pl.when(ki == 0)
        def _init_dq():
            dq_scratch[...] = jnp.zeros_like(dq_scratch)

    msk = mask_ref[0, 0]
    # Fully masked kv block => p == 0 everywhere => dk = dv = 0 and no dq
    # contribution (finalize still writes the zero scratch). Fully masked q
    # block => do == 0 rows contribute nothing and dq rows are discarded
    # upstream. Same pairs as skipped in forward.
    live = jnp.logical_and(jnp.any(msk != 0), jnp.any(qmask_ref[0, 0] != 0))

    @pl.when(live)
    def _compute():
        inv_t = 1.0 / temperature
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.bfloat16)
        v = v_ref[0].astype(jnp.bfloat16)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            (q * inv_t).astype(jnp.bfloat16), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)        # [BQ, BK]
        s = jnp.where(msk[None, :] != 0, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])                  # true softmax probs

        dp = jax.lax.dot_general(
            do.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)        # [BQ, BK]

        if dropout > 0.0:
            keep = 1.0 - dropout
            dm = _drop_mask(seed_ref, bh, qi,
                            ki * (p.shape[1] // 128), p.shape, keep)
            dpd = jnp.where(dm, dp * (1.0 / keep), 0.0)
            p_num = jnp.where(dm, p * (1.0 / keep), 0.0)
        else:
            dpd = dp
            p_num = p

        ds = p * (dpd - delta[:, None])                # [BQ, BK]
        dsb = ds.astype(jnp.bfloat16)

        dv_scratch[...] += jax.lax.dot_general(
            p_num.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)        # [BK, D]
        dk_scratch[...] += jax.lax.dot_general(
            dsb, (q * inv_t).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)        # [BK, D]
        dq_scratch[pl.ds(qi * block_q, block_q), :] += jax.lax.dot_general(
            dsb, k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32) * inv_t  # [BQ, D]

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)

        @pl.when(ki == num_k_blocks - 1)
        def _flush_dq():
            dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_backward(q, k, v, kv_mask, q_mask, out, lse, g, temperature: float,
                    dropout: float = 0.0, seed=None,
                    block_q: int = None, block_k: int = None):
    # block_k 768 (vs 1024 forward): the fused kernel's [block_q, block_k]
    # f32 stack temporaries (s/p/dp/ds/dropout) plus the resident dq plane
    # exceed the 16 MB scoped-vmem budget at 1024; 512 measured worse
    # (more per-block overhead).
    block_q = _block_override("CSN_FLASH_BQ", block_q or 512)
    block_k = _block_override("CSN_FLASH_BK", block_k or 768)
    b, h, lq, dk_dim = q.shape
    lk = k.shape[2]
    dv = v.shape[-1]
    qf, kf, vf, mp, qmp, block_q, block_k, lqp, lkp = _prep(
        q, k, v, kv_mask, q_mask, block_q, block_k)
    gf, _ = _pad_to(g, 2, block_q)
    gf = gf.reshape(b * h, lqp, dv)
    lse_p, _ = _pad_to(lse, 2, block_q)
    lse_f = lse_p.reshape(b * h, 1, lqp)
    # delta_i = sum_d dO_id * O_id (rowsum) — computed in XLA, tiny.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta_p, _ = _pad_to(delta, 2, block_q)
    delta_f = delta_p.reshape(b * h, 1, lqp)

    nq, nk = lqp // block_q, lkp // block_k
    if dropout > 0.0:
        _check_drop_seed_bounds(lqp, lkp, block_q)
    seed_arr = (jnp.zeros((1, 1), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1, 1))

    kernel = functools.partial(_bwd_fused_kernel, temperature=temperature,
                               num_q_blocks=nq, num_k_blocks=nk,
                               block_q=block_q, dropout=dropout)
    dk, dv_out, dq = pl.pallas_call(
        kernel,
        grid=(b * h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, dk_dim), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, dk_dim), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_q, dv), lambda bh, ki, qi: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda bh, ki, qi: (bh, 0, qi)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, ki, qi: (bh // h, 0, ki)),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, ki, qi: (bh // h, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, dk_dim), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bh, ki, qi: (bh, ki, 0)),
            # dq: whole [lqp, D] plane per bh, VMEM-resident across the
            # (ki, qi) sweep, accumulated in-place (~1.5 MB at L0=5632)
            pl.BlockSpec((1, lqp, dk_dim), lambda bh, ki, qi: (bh, 0, 0)),
        ),
        out_shape=(
            # dk/dv accumulate in f32 scratch and are written once at
            # finalize — emitting them in k/v dtype moves the (bitwise
            # identical) f32->bf16 cast into the kernel's store, deleting
            # two [b*h, lkp, D] XLA convert passes (~1 ms/step measured).
            # dq accumulates IN its output ref across kv blocks, so it
            # must stay f32.
            jax.ShapeDtypeStruct((b * h, lkp, dk_dim), k.dtype),
            jax.ShapeDtypeStruct((b * h, lkp, dv), v.dtype),
            jax.ShapeDtypeStruct((b * h, lqp, dk_dim), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dk_dim), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
            pltpu.VMEM((lqp, dk_dim), jnp.float32),
        ],
        # the resident dq plane (+ double-buffered in/out blocks) slightly
        # exceeds the default 16 MB scoped-vmem budget at L0-size lqp
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=weakest_vmem_budget(lqp, dk_dim, dv, block_q,
                                                 block_k)),
    )(seed_arr, qf, kf, vf, gf, lse_f, delta_f, mp, qmp)

    dq = dq.reshape(b, h, lqp, dk_dim)[:, :, :lq].astype(q.dtype)
    dk = dk.reshape(b, h, lkp, dk_dim)[:, :, :lk].astype(k.dtype)
    dv_out = dv_out.reshape(b, h, lkp, dv)[:, :, :lk].astype(v.dtype)
    return dq, dk, dv_out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def flash_attention(q, k, v, kv_mask=None, q_mask=None, seed=None,
                    temperature: float = 1.0, dropout: float = 0.0):
    """[B, H, Lq, Dk] x [B, H, Lk, Dk] x [B, H, Lk, Dv] -> [B, H, Lq, Dv].

    Fully Pallas: flash forward + flash backward, deterministic in-kernel
    attention dropout (same mask in fwd/bwd). `seed` is a traced int32 scalar
    (vary it per training step). `q_mask` [B, Lq] marks valid query rows —
    fully padded (q-block, kv-block) pairs are skipped entirely. Rows in a
    skipped q block come out ZERO, other padded rows junk: callers must mask
    query-side outputs either way (they already do)."""
    out, _ = _flash_forward(q, k, v, kv_mask, q_mask, temperature, dropout,
                            seed)
    return out


def _fa_fwd(q, k, v, kv_mask, q_mask, seed, temperature, dropout):
    out, lse = _flash_forward(q, k, v, kv_mask, q_mask, temperature, dropout,
                              seed)
    return out, (q, k, v, kv_mask, q_mask, seed, out, lse)


def _fa_bwd(temperature, dropout, res, g):
    q, k, v, kv_mask, q_mask, seed, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, q_mask, out, lse, g,
                                 temperature, dropout, seed)
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)
