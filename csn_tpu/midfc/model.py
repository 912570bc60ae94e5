"""MID-FC CrossShapeAt head: SSA/CSA over precomputed O-CNN HRNet features.

Port of `MID-FC/csa_models.py:146-242` (the used `after_fc=True` configs:
`backbone_fc_{ssa,csa}_logit`, d_model=256, d_k=d_v=256): the input is the
`fc_1` 256-d per-point feature map extracted by the O-CNN MID-FC network
(`MID-FC/ocnn_extraction/tfsolver.py:206-268`), padded to 10000 points by
prefix repetition (`features_data_loader.py:37-43`).

Faithful quirk: the reference MHA runs on fixed 500-point chunks — each point
attends only to its own chunk of 500, in both SSA and CSA
(`csa_models.py:81-125`). `chunk_size=500` reproduces that block-diagonal
attention exactly (required for checkpoint-eval parity); `chunk_size=None`
gives full attention (a TPU-friendly improvement, off by default).

Compatibility (`csa_models.py:209-230`): mean-pooled SSA features ->
Linear(256,256, with bias) q/k -> L2 normalize -> plain cosine (temperature 1)
-> softmax over [self]+K. (The reference's `u_k.view(B, -1, 256)` mixes batch
elements for B>1; it always runs with batch_size=1 (`csa_training.py:28`), so
the correct per-shape batched semantics implemented here agree with it on
every shipped config.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.models.layers import MaskedBatchNorm
from csn_tpu.ops.attention import MultiHeadAttention


class ChunkedMHA(nn.Module):
    """MHA applied independently per contiguous chunk of `chunk_size` points.

    chunk_size=None -> single full-attention call."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    chunk_size: Optional[int] = 500
    use_flash: bool = False
    ring_axis: Optional[str] = None   # full-attention point sharding

    def setup(self):
        if self.chunk_size is not None and self.ring_axis is not None:
            # ringing per-chunk blocks would attend each local chunk to the
            # union of same-index chunks on every chip — neither chunked nor
            # full attention. ring_axis is the chunk_size=None sharded form.
            raise ValueError(
                "ring_axis requires chunk_size=None (full attention); "
                "chunked attention is block-diagonal and point shards are "
                "independent — no ring needed")
        self.mha = MultiHeadAttention(
            n_head=self.n_head, d_model=self.d_model, d_k=self.d_k,
            d_v=self.d_v, dropout=self.dropout, use_flash=self.use_flash,
            ring_axis=self.ring_axis)

    def __call__(self, q, k, v, train: bool = False):
        if self.chunk_size is None:
            return self.mha(q, k, v, train=train)
        b, p, d = q.shape
        c = self.chunk_size
        assert p % c == 0, f"points {p} not divisible by chunk {c}"
        n = p // c
        qc = q.reshape(b * n, c, d)
        kc = k.reshape(b * n, c, d)
        vc = v.reshape(b * n, c, d)
        out = self.mha(qc, kc, vc, train=train)
        return out.reshape(b, p, d)


class CrossShapeAt(nn.Module):
    """`csa_models.py:146-242`. Inputs are [B, P, C] point features."""

    num_classes: int
    d_model: int = 256
    n_heads: int = 8
    K: int = 0
    d_k: int = 256
    d_v: int = 256
    attention_type: str = "ssa"      # 'ssa' | 'csa'
    after_fc: bool = True
    chunk_size: Optional[int] = 500
    use_flash: bool = False
    bn_momentum: float = 0.1         # torch BatchNorm2d default
    dropout: float = 0.1             # attention + output-proj dropout rate
    # activation dtype for the attention stack (the classifier head always
    # computes in f32, mirroring the Mink branch's ADVICE-r2 rule). f32
    # default keeps checkpoint-eval parity (get_csa_pred) exact; training
    # can opt into bf16 (CSA chunked step 228 -> 100 ms at B=4 on v5e).
    compute_dtype: str = "float32"
    # When set (e.g. 'seq'), the module is running inside a shard_map whose
    # named axis shards the POINT dimension in equal slices: the chunked
    # (block-diagonal) attention is then embarrassingly point-parallel, and
    # only the mean-pooled compatibility descriptors need a collective —
    # pmean of equal-size local means == the global mean exactly
    # (parallel/midfc.py). None = ordinary single-shard execution.
    seq_axis: Optional[str] = None

    def setup(self):
        # fc_1: 928 -> 256 conv1x1 (no bias) + BN + ReLU; only used when
        # after_fc=False (backbone-feature input), `csa_models.py:150,191-202`.
        if not self.after_fc:
            self.fc_1 = nn.Dense(256, use_bias=False)
            self.fc_1_bn = MaskedBatchNorm(momentum=self.bn_momentum)
        # logit: 256 -> C conv1x1, xavier-uniform, no bias
        # (`csa_models.py:151,177-180`).
        self.logit = nn.Dense(self.num_classes, use_bias=False,
                              kernel_init=nn.initializers.xavier_uniform())
        # chunk_size=None (full attention, the TPU-friendly upgrade path)
        # under point sharding routes through ring_attention — chunked
        # attention is block-diagonal and needs no ring (shards are
        # independent)
        ring = self.seq_axis if (self.seq_axis is not None
                                 and self.chunk_size is None) else None
        self.attention = ChunkedMHA(
            n_head=self.n_heads, d_model=self.d_model, d_k=self.d_k,
            d_v=self.d_v, dropout=self.dropout, chunk_size=self.chunk_size,
            use_flash=self.use_flash, ring_axis=ring)
        if "csa" in self.attention_type:
            # the reference hard-codes 256 == d_model (`csa_models.py:160-161`)
            self.compatibility_q = nn.Dense(self.d_model, use_bias=True)
            self.compatibility_k = nn.Dense(self.d_model, use_bias=True)

    def _maybe_fc(self, x, train: bool):
        if self.after_fc:
            return x
        assert self.seq_axis is None, (
            "seq_axis sharding is only supported with after_fc=True (the "
            "fc_1 BatchNorm would need cross-shard statistics; every "
            "shipped MID-FC config is after_fc=True)")
        b, p, _ = x.shape
        mask = jnp.ones((b, p), dtype=bool)
        y = self.fc_1(x)
        y = self.fc_1_bn(y, mask, train)
        return jax.nn.relu(y)

    def get_ssa_feats(self, x, train: bool = False):
        """`csa_models.py:204-207`. x: [B, P, d_model] -> [B, P, d_model].

        Casts to compute_dtype here (not only in __call__) so direct
        `method=get_ssa_feats` surfaces (knn-graph feature extraction) run
        the same numerics as the rest of the model; the astype is a no-op
        when __call__ already cast."""
        x = x.astype(jnp.dtype(self.compute_dtype))
        return self.attention(x, x, x, train=train)

    def _pool(self, ssa):
        """Mean over points; a pmean over `seq_axis` completes the global
        mean when the point axis is sharded (equal-size shards)."""
        pooled = ssa.mean(axis=1)
        if self.seq_axis is not None:
            pooled = jax.lax.pmean(pooled, self.seq_axis)
        return pooled

    def get_csa_feats(self, x, neighbors, train: bool = False):
        """`csa_models.py:209-242`. neighbors: [B, K+1, P, d] with self at
        index 0 (only indices 1..K are attended; index 0's slot mirrors the
        reference's convention)."""
        kplus1 = neighbors.shape[1]
        # One SSA pass serves both the pooled compatibility descriptor and
        # the self CSA term below. The reference recomputes the identical
        # attention(x, x, x) a second time (`csa_models.py:209` then `:232`);
        # eval-mode output is bit-identical either way (the sibling Mink head
        # reuses q_ssa the same way, hrnet.py), train mode differs only in
        # the unpromised dropout stream. Saves 1 of 2K+2 MHA passes per step.
        ssa_q = self.get_ssa_feats(x, train)
        y_q = self._pool(ssa_q)                                   # [B, d]
        pools = [y_q]
        for k in range(1, kplus1):
            n_ssa = self.get_ssa_feats(neighbors[:, k], train)
            pools.append(self._pool(n_ssa))
        u_q = self.compatibility_q(y_q)
        u_q = u_q / jnp.maximum(
            jnp.linalg.norm(u_q, axis=-1, keepdims=True), 1e-12)
        u_k = self.compatibility_k(jnp.stack(pools, axis=1))      # [B, K+1, d]
        u_k = u_k / jnp.maximum(
            jnp.linalg.norm(u_k, axis=-1, keepdims=True), 1e-12)
        comp = jax.nn.softmax(
            jnp.einsum("bd,bkd->bk", u_q, u_k), axis=-1)          # [B, K+1]

        csa = comp[:, 0, None, None] * ssa_q
        for k in range(1, kplus1):
            xk = neighbors[:, k]
            csa = csa + comp[:, k, None, None] * self.attention(
                x, xk, xk, train=train)
        return csa

    def __call__(self, x, neighbors=None, train: bool = False):
        """x: [B, P, C_in]; returns logits [B, P, num_classes]."""
        x = self._maybe_fc(x, train)
        cdt = jnp.dtype(self.compute_dtype)
        x = x.astype(cdt)
        if self.attention_type == "ssa":
            feats = self.get_ssa_feats(x, train)
        elif self.attention_type == "csa":
            assert neighbors is not None
            feats = self.get_csa_feats(x, neighbors.astype(cdt), train)
        else:
            raise AttributeError(f"{self.attention_type} not supported")
        return self.logit(feats.astype(jnp.float32))


def get_model(attention_type: str, num_classes: int, n_heads: int,
              K: Optional[int] = None, chunk_size: Optional[int] = 500,
              use_flash: bool = False, d_model: int = 256,
              compute_dtype: str = "float32", dropout: float = 0.1,
              seq_axis: Optional[str] = None) -> CrossShapeAt:
    """`csa_models.py:426-432` factory (after_fc=True, d_model=256; the
    reference also uses d_k=d_v=256 == d_model regardless of n_heads,
    `csa_models.py:147`)."""
    if attention_type == "ssa":
        return CrossShapeAt(num_classes=num_classes, d_model=d_model,
                            d_k=d_model, d_v=d_model,
                            n_heads=n_heads, attention_type="ssa",
                            after_fc=True, chunk_size=chunk_size,
                            use_flash=use_flash, dropout=dropout,
                            compute_dtype=compute_dtype, seq_axis=seq_axis)
    if attention_type == "csa":
        return CrossShapeAt(num_classes=num_classes, d_model=d_model,
                            d_k=d_model, d_v=d_model,
                            n_heads=n_heads, K=K, attention_type="csa",
                            after_fc=True, chunk_size=chunk_size,
                            use_flash=use_flash, dropout=dropout,
                            compute_dtype=compute_dtype, seq_axis=seq_axis)
    raise AttributeError(f"{attention_type} not supported")
