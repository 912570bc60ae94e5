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
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


class MultiHeadAttention(nn.Module):
    """Post-norm residual MHA (`models/attention.py:9-56`).

    Call with q/k/v of shape [B, L, d_model]. `kv_mask` masks padded keys;
    padded query rows produce junk and must be masked by the caller (the
    reference never sees padding because it loops per shape).

    `use_flash=True` routes the softmax-attention core through the Pallas
    flash kernel on TPU (ops/flash.py); otherwise the XLA einsum path is used.
    """

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        kv_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        b, lq, _ = q.shape
        lk = k.shape[1]
        residual = q

        wq = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_qs")
        wk = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_ks")
        wv = nn.Dense(self.n_head * self.d_v, use_bias=False, name="w_vs")
        fc = nn.Dense(self.d_model, use_bias=False, name="fc")

        qh = wq(q).reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = wk(k).reshape(b, lk, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = wv(v).reshape(b, lk, self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn_rng = None
        if train and self.dropout > 0.0:
            attn_rng = self.make_rng("dropout")

        if self.use_flash and attn_rng is None:
            from csn_tpu.ops.flash import flash_attention

            out = flash_attention(qh, kh, vh, kv_mask,
                                  temperature=float(self.d_k) ** 0.5)
        else:
            out = scaled_dot_product_attention(
                qh, kh, vh, kv_mask,
                temperature=float(self.d_k) ** 0.5,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=attn_rng,
            )

        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.n_head * self.d_v)
        out = fc(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6)(out)
        return out


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
