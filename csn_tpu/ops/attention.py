"""Self-/cross-shape attention primitives.

Reference semantics (`MinkowskiNet/models/attention.py:9-75`, duplicated at
`MID-FC/csa_models.py:37-144`): post-norm residual multi-head attention —
no-bias q/k/v/out projections, scaled dot-product with temperature sqrt(d_k),
dropout 0.1 on attention weights and on the output projection, residual add,
then LayerNorm(eps=1e-6).

The TPU version runs batched over padded point sets `[B, L, d]` with boolean
masks — this replaces both the per-batch-element Python loop of the reference
(`models/hrnet.py:378-410`) and MID-FC's hard-coded 20x500 chunking
(`csa_models.py:81-125`) with one vectorized (optionally Pallas flash) kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def scaled_dot_product_attention(
    q: jnp.ndarray,            # [B, H, Lq, Dk]
    k: jnp.ndarray,            # [B, H, Lk, Dk]
    v: jnp.ndarray,            # [B, H, Lk, Dv]
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lk] bool
    temperature: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Masked softmax attention (XLA path). Returns [B, H, Lq, Dv]."""
    if temperature is None:
        temperature = float(q.shape[-1]) ** 0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q / temperature, k,
        preferred_element_type=jnp.float32,
    )
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = fast_bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def fast_bernoulli(rng, keep_prob: float, shape):
    """Bernoulli(keep_prob) mask via 16-bit random bits + integer compare.

    `jax.random.bernoulli`'s f32-uniform path is pathologically slow on this
    TPU stack: 155 ms vs 0.5 ms for one [80, 8, 500, 500] mask (v5e probe
    2026-08-18) — 30% of the whole MID-FC CSA train step was mask
    generation. The 16-bit threshold quantizes keep_prob by < 1.6e-5
    (0.9 -> 0.899994), immaterial for dropout regularization (the masks are
    different random bits than bernoulli's, not a bit-compatible drop-in —
    fine: no surface promises a particular dropout stream)."""
    t = int(round(float(keep_prob) * 65536.0))
    if t >= 65536:  # keep everything — the uint16 compare cannot express
        return jnp.ones(shape, dtype=bool)  # P(keep)=1 (65535/65536 max)
    t = max(0, t)
    return jax.random.bits(rng, shape, jnp.uint16) < jnp.uint16(t)


def _online_block_update(carry, qt, k_b, v_b, msk_b, keep, rng_b):
    """One online-softmax block update over (k_b, v_b, msk_b) — the single
    source of the numerically delicate running-max/rescale/denominator math
    shared by `online_attention` (local kv blocks) and `ring_attention`
    (blocks arriving over ICI). `rng_b` is the per-block dropout key or
    None; dropout uses the flash rescaling identity (numerator masked and
    /keep, denominator UNdropped == torch's dropout(softmax(s)) @ v)."""
    m_run, denom, acc = carry
    s = jnp.einsum("bhqd,bhkd->bhqk", qt, k_b.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    s = jnp.where(msk_b[:, None, None, :], s, NEG_INF)
    m_new = jnp.maximum(m_run, s.max(axis=-1))
    scale = jnp.exp(m_run - m_new)
    e = jnp.exp(s - m_new[..., None])
    denom = denom * scale + e.sum(axis=-1)
    if rng_b is not None:
        dmask = fast_bernoulli(rng_b, keep, e.shape)
        e_num = jnp.where(dmask, e / keep, 0.0)
    else:
        e_num = e
    acc = acc * scale[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", e_num, v_b.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return m_new, denom, acc


def online_attention(
    q: jnp.ndarray,            # [B, H, Lq, Dk]
    k: jnp.ndarray,            # [B, H, Lk, Dk]
    v: jnp.ndarray,            # [B, H, Lk, Dv]
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lk] bool
    temperature: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    kv_block: int = 1024,
) -> jnp.ndarray:
    """Blocked online-softmax (flash-style) attention without materializing
    the [Lq, Lk] score matrix. Numerically identical to softmax attention;
    dropout uses the flash rescaling identity (numerator dropped, denominator
    undropped), which is exactly torch's dropout(softmax(s)) @ v.

    Memory: O(Lq * kv_block) per step instead of O(Lq * Lk) — this replaces
    the reference's 20x500 chunk hack (`MID-FC/csa_models.py:83-91`) and makes
    SSA/CSA over full 4-5k-voxel shapes fit in HBM with gradients.
    """
    if temperature is None:
        temperature = float(q.shape[-1]) ** 0.5
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[-1]
    nb = -(-lk // kv_block)
    pad = nb * kv_block - lk

    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if kv_mask is None:
        m = jnp.ones((b, lk), dtype=bool)
    else:
        m = kv_mask
    mp = jnp.pad(m, ((0, 0), (0, pad)))

    kb = kp.reshape(b, h, nb, kv_block, dk).transpose(2, 0, 1, 3, 4)
    vb = vp.reshape(b, h, nb, kv_block, dv).transpose(2, 0, 1, 3, 4)
    mb = mp.reshape(b, nb, kv_block).transpose(1, 0, 2)
    blk_idx = jnp.arange(nb)

    qt = (q / temperature).astype(jnp.float32)
    keep = 1.0 - dropout_rate
    use_drop = dropout_rate > 0.0 and dropout_rng is not None

    def body(carry, inp):
        k_b, v_b, msk_b, i_b = inp
        rng_b = jax.random.fold_in(dropout_rng, i_b) if use_drop else None
        return _online_block_update(carry, qt, k_b, v_b, msk_b, keep,
                                    rng_b), None

    init = (
        jnp.full((b, h, lq), NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, h, lq), dtype=jnp.float32),
        jnp.zeros((b, h, lq, dv), dtype=jnp.float32),
    )
    (m_run, denom, acc), _ = jax.lax.scan(
        jax.checkpoint(body), init, (kb, vb, mb, blk_idx))
    out = acc / jnp.maximum(denom, 1e-30)[..., None]
    return out.astype(v.dtype)


def ring_attention(
    q: jnp.ndarray,            # [B, H, Lq_local, Dk]  (this chip's queries)
    k: jnp.ndarray,            # [B, H, Lk_local, Dk]  (this chip's K shard)
    v: jnp.ndarray,            # [B, H, Lk_local, Dv]
    kv_mask: Optional[jnp.ndarray],  # [B, Lk_local] bool, travels with K/V
    axis: str,                 # mesh axis name sharding the point dimension
    temperature: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Exact FULL attention over a point axis sharded across chips — the
    sequence-parallel slot designed in SURVEY.md §5.7 ('shard the key/value
    point axis across ICI neighbors, ring-style pass of K/V blocks').

    Must run inside shard_map over `axis`. Each of the n_axis steps computes
    the online-softmax contribution of the K/V block currently held, then
    ppermutes the block (and its mask) one hop around the ring; after n
    steps every chip has attended its local queries to the GLOBAL key set,
    with O(Lq_local * Lk_local) live scores — the same math as
    `online_attention`, with ICI neighbors standing in for the kv-block
    loop and `_online_block_update` the shared math. Differentiable
    (lax.scan + checkpointed body; ppermute's transpose is the inverse
    ppermute). Dropout uses the flash rescaling identity (numerator
    dropped, denominator undropped) with the mask keyed by the (query
    chip, origin chip) pair so every global (q, k) element sees exactly
    one draw. The ring makes n-1 hops: the locally-held block is consumed
    before the first permute, and the last-received block is not
    forwarded.
    """
    if temperature is None:
        temperature = float(q.shape[-1]) ** 0.5
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, lq, _dk = q.shape
    dv = v.shape[-1]
    if kv_mask is None:
        kv_mask = jnp.ones((b, k.shape[2]), dtype=bool)
    qt = (q / temperature).astype(jnp.float32)
    keep = 1.0 - dropout_rate
    use_drop = dropout_rate > 0.0 and dropout_rng is not None
    perm = [(i, (i + 1) % n) for i in range(n)]

    def rng_for(src):
        if not use_drop:
            return None
        return jax.random.fold_in(jax.random.fold_in(dropout_rng, me), src)

    def body(carry, step):
        m_run, denom, acc, k_b, v_b, msk_b = carry
        # receive before compute: at scan step t (1..n-1) we hold the
        # block that originated on chip (me - t) % n
        k_b = jax.lax.ppermute(k_b, axis, perm)
        v_b = jax.lax.ppermute(v_b, axis, perm)
        msk_b = jax.lax.ppermute(msk_b, axis, perm)
        upd = _online_block_update((m_run, denom, acc), qt, k_b, v_b, msk_b,
                                   keep, rng_for((me - step) % n))
        return upd + (k_b, v_b, msk_b), None

    init3 = (
        jnp.full((b, h, lq), NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, h, lq), dtype=jnp.float32),
        jnp.zeros((b, h, lq, dv), dtype=jnp.float32),
    )
    # step 0: the locally-held block, no hop (keep closed over: it must
    # stay a static Python float for fast_bernoulli's threshold)
    first = jax.checkpoint(
        lambda c, q_, k_, v_, m_, r: _online_block_update(
            c, q_, k_, v_, m_, keep, r))(
        init3, qt, k, v, kv_mask, rng_for(me))
    (m_run, denom, acc, _, _, _), _ = jax.lax.scan(
        jax.checkpoint(body), first + (k, v, kv_mask), jnp.arange(1, n))
    out = acc / jnp.maximum(denom, 1e-30)[..., None]
    return out.astype(v.dtype)


def _ring_hop_seed(seed, me, n, step):
    """Distinct int32 seed per (query chip, origin chip) pair for the flash
    ring's in-kernel dropout: origin = (me - step) % n. Uniqueness for a
    fixed base seed holds because |me*n + origin| < n^2 << 2^31 — every
    global (q, k) element sees exactly one draw (the same keying contract as
    the online ring's fold_in pair)."""
    if seed is None:
        return None
    origin = jax.lax.rem(me - step + n, n)
    return (jnp.asarray(seed, jnp.int32) * jnp.int32(65599)
            + me.astype(jnp.int32) * jnp.int32(n)
            + origin.astype(jnp.int32))


def _ring_flash_scan(q, k, v, kv_mask, axis, temperature, dropout, seed):
    """The flash ring forward: hop K/V blocks around `axis`, running the
    Pallas carry kernel (ops/flash.py flash_forward_carry) per block.
    Returns (out f32, lse). Shared by the primal and the vjp-fwd."""
    from csn_tpu.ops.flash import (
        flash_carry_finalize, flash_carry_init, flash_forward_carry,
    )

    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, lq, _dk = q.shape
    dv = v.shape[-1]
    carry0 = flash_carry_init(b, h, lq, dv)
    # step 0: the locally-held block, no hop
    c = flash_forward_carry(q, k, v, kv_mask, None, carry0, temperature,
                            dropout, _ring_hop_seed(seed, me, n, 0))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(state, step):
        carry, k_b, v_b, m_b = state
        k_b = jax.lax.ppermute(k_b, axis, perm)
        v_b = jax.lax.ppermute(v_b, axis, perm)
        m_b = jax.lax.ppermute(m_b, axis, perm)
        carry = flash_forward_carry(q, k_b, v_b, m_b, None, carry,
                                    temperature, dropout,
                                    _ring_hop_seed(seed, me, n, step))
        return (carry, k_b, v_b, m_b), None

    (c, _, _, _), _ = jax.lax.scan(body, (c, k, v, kv_mask),
                                   jnp.arange(1, n))
    return flash_carry_finalize(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_flash(q, k, v, kv_mask, axis, temperature, dropout, seed):
    out, _lse = _ring_flash_scan(q, k, v, kv_mask, axis, temperature,
                                 dropout, seed)
    return out.astype(v.dtype)


def _ring_flash_fwd(q, k, v, kv_mask, axis, temperature, dropout, seed):
    out, lse = _ring_flash_scan(q, k, v, kv_mask, axis, temperature,
                                dropout, seed)
    return out.astype(v.dtype), (q, k, v, kv_mask, seed, out, lse)


def _ring_flash_bwd(axis, temperature, dropout, res, g):
    """Ring backward: re-ring the K/V blocks once; each hop runs the fused
    Pallas flash backward (ops/flash.py flash_block_backward) against the
    GLOBAL (out, lse, g) — dq accumulates locally, the per-block (dk, dv)
    cotangents travel WITH their block and are home after the n-th hop.
    Total traffic: n hops of (k, v, mask, dk, dv) — no forward recompute,
    which also retires the checkpointed-scan ring's doubled ppermute traffic
    (ADVICE r3 #2) on this path."""
    from csn_tpu.ops.flash import flash_block_backward

    q, k, v, kv_mask, seed, out, lse = res
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    dq0 = jnp.zeros(q.shape, jnp.float32)

    def body(state, step):
        k_b, v_b, m_b, dk_acc, dv_acc, dq = state
        dq_c, dk_c, dv_c = flash_block_backward(
            q, k_b, v_b, m_b, out, lse, g, temperature, dropout,
            _ring_hop_seed(seed, me, n, step))
        dq = dq + dq_c.astype(jnp.float32)
        dk_acc = dk_acc + dk_c.astype(jnp.float32)
        dv_acc = dv_acc + dv_c.astype(jnp.float32)
        # block + its accumulated cotangent move one hop together; after n
        # total hops the cotangents sit on the block's origin chip
        k_b = jax.lax.ppermute(k_b, axis, perm)
        v_b = jax.lax.ppermute(v_b, axis, perm)
        m_b = jax.lax.ppermute(m_b, axis, perm)
        dk_acc = jax.lax.ppermute(dk_acc, axis, perm)
        dv_acc = jax.lax.ppermute(dv_acc, axis, perm)
        return (k_b, v_b, m_b, dk_acc, dv_acc, dq), None

    init = (k, v, kv_mask, jnp.zeros(k.shape, jnp.float32),
            jnp.zeros(v.shape, jnp.float32), dq0)
    (k_b, v_b, m_b, dk_acc, dv_acc, dq), _ = jax.lax.scan(
        body, init, jnp.arange(n))
    return (dq.astype(q.dtype), dk_acc.astype(k.dtype),
            dv_acc.astype(v.dtype), None, None)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_flash_attention(q, k, v, kv_mask, axis: str,
                         temperature: Optional[float] = None,
                         dropout_rate: float = 0.0, dropout_rng=None,
                         seed=None):
    """`ring_attention` with the per-block compute on the Pallas flash
    kernels (carry-in accumulators): exact full attention over the sharded
    point axis at flash speed. Dropout runs in-kernel (TPU PRNG) keyed by
    (query chip, origin chip) — deterministic given `seed`, a different
    stream than the online ring's fast_bernoulli (no surface promises a
    particular dropout stream). Differentiable via one custom VJP over the
    whole ring (see _ring_flash_bwd)."""
    if temperature is None:
        temperature = float(q.shape[-1]) ** 0.5
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    if dropout_rate > 0.0 and seed is None and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (), 0, 2 ** 31 - 1)
    if dropout_rate <= 0.0:
        seed = None
    return _ring_flash(q, k, v, kv_mask, axis, temperature,
                       dropout_rate if seed is not None else 0.0, seed)


class MultiHeadAttention(nn.Module):
    """Post-norm residual MHA (`models/attention.py:9-56`).

    Call with q/k/v of shape [B, L, d_model]. `kv_mask` masks padded keys;
    padded query rows produce junk and must be masked by the caller (the
    reference never sees padding because it loops per shape). `q_mask` marks
    valid query rows: optional, purely a performance hint — the flash kernel
    skips fully padded (q-block, kv-block) pairs.

    `use_flash=True` routes the softmax-attention core through the Pallas
    flash kernel on TPU (ops/flash.py); otherwise the XLA einsum path is used.
    """

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    use_flash: bool = False
    # 'auto': dense softmax for short keys, blocked online-softmax beyond
    # `dense_max_kv` (keeps the [Lq, Lk] score matrix out of HBM).
    attn_impl: str = "auto"
    dense_max_kv: int = 1024
    kv_block: int = 1024
    # Set (to a mesh axis name) when the module runs inside shard_map with
    # the POINT axis of q/k/v sharded over that axis: the attention core
    # becomes a ppermute ring of K/V blocks computing exact full attention
    # over the global key set. With use_flash=True the per-block compute is
    # the Pallas flash carry kernel (ring_flash_attention); otherwise the
    # XLA online-softmax path (ring_attention).
    ring_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        kv_mask: Optional[jnp.ndarray] = None,
        q_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        b, lq, _ = q.shape
        lk = k.shape[1]
        residual = q

        # projections run in the activation dtype (bf16 under mixed
        # precision); the LayerNorm below computes in f32 regardless
        adt = q.dtype
        wq = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_qs",
                      dtype=adt)
        wk = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_ks",
                      dtype=adt)
        wv = nn.Dense(self.n_head * self.d_v, use_bias=False, name="w_vs",
                      dtype=adt)
        fc = nn.Dense(self.d_model, use_bias=False, name="fc", dtype=adt)

        qh = wq(q).reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = wk(k).reshape(b, lk, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = wv(v).reshape(b, lk, self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn_rng = None
        if train and self.dropout > 0.0:
            attn_rng = self.make_rng("dropout")

        temp = float(self.d_k) ** 0.5
        impl = self.attn_impl
        if impl == "auto":
            impl = "dense" if lk <= self.dense_max_kv else "online"

        if self.ring_axis is not None:
            if self.use_flash:
                out = ring_flash_attention(
                    qh, kh, vh, kv_mask, axis=self.ring_axis,
                    temperature=temp,
                    dropout_rate=self.dropout if train else 0.0,
                    dropout_rng=attn_rng)
            else:
                out = ring_attention(
                    qh, kh, vh, kv_mask, axis=self.ring_axis,
                    temperature=temp,
                    dropout_rate=self.dropout if train else 0.0,
                    dropout_rng=attn_rng)
        elif self.use_flash:
            from csn_tpu.ops.flash import flash_attention

            if attn_rng is not None:
                seed = jax.random.randint(attn_rng, (1,), 0, 2 ** 31 - 1)
                out = flash_attention(qh, kh, vh, kv_mask, q_mask, seed,
                                      temperature=temp,
                                      dropout=self.dropout)
            else:
                out = flash_attention(qh, kh, vh, kv_mask, q_mask,
                                      temperature=temp)
        elif impl == "online":
            out = online_attention(
                qh, kh, vh, kv_mask, temperature=temp,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=attn_rng, kv_block=self.kv_block)
        else:
            out = scaled_dot_product_attention(
                qh, kh, vh, kv_mask, temperature=temp,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=attn_rng,
            )

        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.n_head * self.d_v)
        out = fc(out)
        if train and self.dropout > 0.0:
            # manual dropout: nn.Dropout routes through the slow bernoulli
            km = fast_bernoulli(self.make_rng("dropout"),
                                1.0 - self.dropout, out.shape)
            out = jnp.where(km, out / (1.0 - self.dropout),
                            jnp.zeros_like(out))
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(out)
        return out.astype(adt)


def compatibility_softmax(
    query_glob: jnp.ndarray,   # [B, D] (already linearly transformed + L2 normalized)
    keys_glob: jnp.ndarray,    # [B, K+1, D] ([self] + K neighbors)
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Pairwise compatibility weights over [self]+K keys.

    Mink branch (`models/hrnet.py:377-396`): cos-sim / sqrt(d_model), softmax.
    MID-FC (`csa_models.py:222-230`): plain cos-sim (temperature 1), softmax.
    Returns [B, K+1].
    """
    sim = jnp.einsum("bd,bkd->bk", query_glob, keys_glob) / temperature
    return jax.nn.softmax(sim, axis=-1)
