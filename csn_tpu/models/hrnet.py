"""Sparse HRNet backbones + segmentation / cross-shape-attention heads.

TPU-native re-design of `MinkowskiNet/models/hrnet.py`:

* multi-resolution branches live on the voxel-pyramid levels (stride 2**l);
* exchange blocks are chains of strided / transposed sparse convs over the
  precomputed `down{l}k3` / `up{l}k3` kernel maps, fused by masked sums;
* the SSA/CSA head runs *batched* masked attention over padded `[B, L0, d]`
  voxel sets — replacing the per-batch-element Python loop of
  `models/hrnet.py:378-410,456-470` with one vectorized kernel;
* compatibility weights follow `models/hrnet.py:377-396`: mean-pooled SSA
  features -> no-bias linear q/k -> L2 normalize -> cos/sqrt(d_model) ->
  softmax over [self]+K.

Model variants mirror `models/hrnet.py:278-293,493-508`:
HRNetSeg{2,3,4}S and HRNetSimCSN{2,3,4}S.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.core.pyramid import MapSpec
from csn_tpu.models.blocks import BasicBlock
from csn_tpu.models.layers import (
    Conv1x1, Norm, NormType, SparseConv, global_avg_pool, relu_masked,
)
from csn_tpu.ops.attention import MultiHeadAttention


def _dedup(maps):
    seen, out = set(), []
    for m in maps:
        if m.name not in seen:
            seen.add(m.name)
            out.append(m)
    return tuple(out)


class HRNetBase(nn.Module):
    """Backbone (`models/hrnet.py:16-163`)."""

    out_channels: int
    conv1_kernel_size: int = 5
    bn_momentum: float = 0.02
    norm_type: NormType = NormType.BATCH_NORM
    d_model: int = 256
    n_head: int = 4
    k_neighbors: int = 0
    attn_dropout: float = 0.1
    use_flash: bool = False
    # activation dtype ('float32' | 'bfloat16'): bf16 halves activation HBM
    # traffic; params / BN stats / norm math / descriptors / logits stay f32
    compute_dtype: str = "float32"

    NUM_STAGES = 1
    NUM_BLOCKS = 3
    INIT_DIM = 32
    FEAT_FACTOR = 1

    @classmethod
    def num_levels(cls) -> int:
        return cls.NUM_STAGES

    @classmethod
    def pyramid_requirements(cls, conv1_kernel_size: int = 5) -> Tuple[MapSpec, ...]:
        S = cls.NUM_STAGES
        maps = [MapSpec("same", 0, conv1_kernel_size)]
        maps += [MapSpec("same", l, 3) for l in range(S)]
        maps += [MapSpec("down", l, 3) for l in range(S - 1)]
        maps += [MapSpec("up", l, 3) for l in range(S - 1)]
        return _dedup(maps)

    def _init_stage_dims(self) -> int:
        return self.INIT_DIM * self.FEAT_FACTOR

    def setup(self):
        S = self.NUM_STAGES
        isd = self._init_stage_dims()
        nt, bm = self.norm_type, self.bn_momentum

        self.conv0 = SparseConv(self.INIT_DIM, f"same0k{self.conv1_kernel_size}",
                                input_grad=False)
        self.norm0 = Norm(nt, bm)
        self.conv1 = SparseConv(isd, "same0k3")
        self.norm1 = Norm(nt, bm)

        stages = []
        for i in range(S):
            branches = []
            for j in range(i + 1):
                branches.append(tuple(
                    BasicBlock(planes=isd * 2 ** j, level=j, norm_type=nt,
                               bn_momentum=bm)
                    for _ in range(self.NUM_BLOCKS)
                ))
            stages.append(tuple(branches))
        self.stages = tuple(stages)

        # exchange[i][j][k]: chain of (conv, norm) moving branch j (level j)
        # to level k after stage i (`models/hrnet.py:75-120`).
        ex_all = []
        for i in range(S - 1):
            depth = i + 1
            ex_i = []
            for j in range(depth):
                init_ch = isd * 2 ** j
                ex_j = []
                for k in range(depth + 1):
                    steps = []
                    if j < k:  # downsampling chain
                        for s in range(k - j):
                            steps.append((
                                SparseConv(init_ch * 2 ** (s + 1),
                                           f"down{j + s}k3"),
                                Norm(nt, bm),
                            ))
                    elif j > k:  # upsampling chain
                        for s in range(j - k):
                            steps.append((
                                SparseConv(init_ch // 2 ** (s + 1),
                                           f"up{j - s - 1}k3"),
                                Norm(nt, bm),
                            ))
                    ex_j.append(tuple(steps))
                ex_i.append(tuple(ex_j))
            ex_all.append(tuple(ex_i))
        self.exchange = tuple(ex_all)

        self._setup_head()

    def _setup_head(self):  # overridden by heads
        pass

    def _apply_chain(self, batch, chain, x, src_level: int, direction: int,
                     train: bool):
        """Apply a (conv, norm) chain with ReLUs between steps
        (`models/hrnet.py:84-115`: relu precedes every conv except the first).
        direction +1 = down, -1 = up."""
        lvl = src_level
        for idx, (conv, norm) in enumerate(chain):
            if idx > 0:
                x = relu_masked(x, batch.masks[lvl])
            nxt = lvl + direction
            x = conv(batch, x, batch.masks[nxt].shape)
            x = norm(x, batch.masks[nxt], train)
            lvl = nxt
        return x

    def forward_backbone(self, batch, train: bool):
        """`models/hrnet.py:122-163`. Returns (out_init [B,L0,INIT_DIM],
        stage_outputs tuple of [B,L_l,C_l])."""
        S = self.NUM_STAGES
        m0 = batch.masks[0]
        x = batch.vox_feats.astype(self.compute_dtype)

        out = self.conv0(batch, x, m0.shape)
        out = self.norm0(out, m0, train)
        out_init = relu_masked(out, m0)

        out = self.conv1(batch, out_init, m0.shape)
        out = self.norm1(out, m0, train)
        out = relu_masked(out, m0)

        stage_input = [out]
        stage_output = []
        for i in range(S):
            stage_output = []
            for j in range(i + 1):
                y = stage_input[j]
                for blk in self.stages[i][j]:
                    y = blk(batch, y, train)
                stage_output.append(y)
            if i == S - 1:
                break
            nxt = [[] for _ in range(i + 2)]
            for j in range(i + 1):
                for k in range(i + 2):
                    if j == k:
                        nxt[k].append(stage_output[j])
                    else:
                        direction = 1 if j < k else -1
                        nxt[k].append(self._apply_chain(
                            batch, self.exchange[i][j][k], stage_output[j],
                            j, direction, train))
            stage_input = []
            for k in range(i + 2):
                acc = nxt[k][0]
                for extra in nxt[k][1:]:
                    acc = acc + extra
                stage_input.append(relu_masked(acc, batch.masks[k]))

        return out_init, tuple(stage_output)


class _FinalTransitions(nn.Module):
    """Upsample every lower-resolution branch to level 0
    (`models/hrnet.py:226-244,308-326`)."""

    num_stages: int
    init_stage_dims: int
    norm_type: NormType
    bn_momentum: float

    def setup(self):
        trans = []
        for i in range(1, self.num_stages):
            ch = self.init_stage_dims * 2 ** i
            steps = tuple(
                (SparseConv(ch, f"up{i - s - 1}k3"), Norm(self.norm_type,
                                                          self.bn_momentum))
                for s in range(i)
            )
            trans.append(steps)
        self.trans = tuple(trans)

    def __call__(self, batch, stage_outputs, out_init, train: bool):
        outs = [out_init, stage_outputs[0]]
        for i in range(1, self.num_stages):
            x = stage_outputs[i]
            lvl = i
            for conv, norm in self.trans[i - 1]:
                x = conv(batch, x, batch.masks[lvl - 1].shape)
                x = norm(x, batch.masks[lvl - 1], train)
                x = relu_masked(x, batch.masks[lvl - 1])
                lvl -= 1
            outs.append(x)
        return jnp.concatenate(outs, axis=-1)


class HRNetSeg(HRNetBase):
    """Plain segmentation head (`models/hrnet.py:214-275`).

    The head is a 2-layer 1x1-conv MLP; its hidden activation is the `fc_1`
    feature the MID-FC pipeline extracts per point (the reference's
    `predict_module` returns `(logit, fc_1)`,
    `MID-FC/ocnn_extraction/ocnn.py:225-237`) — expose it with
    `return_fc1=True` for the feature-extraction path
    (csn_tpu/midfc/extraction.py). Hidden width = `d_model` (reference: 256).
    """

    def _setup_head(self):
        self.final_transitions = _FinalTransitions(
            self.NUM_STAGES, self._init_stage_dims(), self.norm_type,
            self.bn_momentum)
        self.fc1 = Conv1x1(self.d_model, use_bias=True)
        self.fc1_norm = Norm(self.norm_type, self.bn_momentum)
        self.fc2 = Conv1x1(self.out_channels, use_bias=True, f32=True)

    def __call__(self, batch, train: bool = False, return_fc1: bool = False):
        out_init, stage_outputs = self.forward_backbone(batch, train)
        out = self.final_transitions(batch, stage_outputs, out_init, train)
        fc1 = self.fc1(out)
        fc1 = self.fc1_norm(fc1, batch.masks[0], train)
        fc1 = relu_masked(fc1, batch.masks[0])
        logits = self.fc2(fc1)
        if return_fc1:
            return logits, fc1.astype(jnp.float32)
        return logits


class HRNetSimCSN(HRNetBase):
    """SSA/CSA cross-shape head (`models/hrnet.py:296-490`).

    __call__(query_batch, key_batches, train, return_ssa):
      * return_ssa=True  -> [B, L0, d_model] SSA features (used for shape-graph
        retrieval, `lib/csn_utils.py:63,82`).
      * K == 0           -> SSA-only model (HRNetSimCSN*_SSA baseline).
      * K > 0            -> compatibility-weighted mix of SSA and per-key CSA.
    """

    def _setup_head(self):
        self.final_transitions = _FinalTransitions(
            self.NUM_STAGES, self._init_stage_dims(), self.norm_type,
            self.bn_momentum)
        self.fc1 = Conv1x1(self.d_model, use_bias=True)
        self.fc1_norm = Norm(self.norm_type, self.bn_momentum)
        self.mha = MultiHeadAttention(
            n_head=self.n_head, d_model=self.d_model,
            d_k=self.d_model // self.n_head, d_v=self.d_model // self.n_head,
            dropout=self.attn_dropout, use_flash=self.use_flash)
        self.out_head = Conv1x1(self.out_channels, use_bias=True, f32=True)
        if self.k_neighbors > 0:
            self.linear_q = nn.Dense(self.d_model, use_bias=False)
            self.linear_k = nn.Dense(self.d_model, use_bias=False)

    def _features(self, batch, train: bool) -> jnp.ndarray:
        """backbone + final transitions + FC to d_model
        (`models/hrnet.py:425-454`)."""
        out_init, stage_outputs = self.forward_backbone(batch, train)
        out = self.final_transitions(batch, stage_outputs, out_init, train)
        out = self.fc1(out)
        out = self.fc1_norm(out, batch.masks[0], train)
        return relu_masked(out, batch.masks[0])

    def _ssa(self, feats, mask, train: bool) -> jnp.ndarray:
        y = self.mha(feats, feats, feats, mask, mask, train=train)
        return jnp.where(mask[..., None], y, 0.0)

    def __call__(self, batch, keys: Sequence = (), train: bool = False,
                 return_ssa: bool = False):
        K = len(keys)
        if K == 0:
            qmask = batch.masks[0]
            q_out = self._features(batch, train)
            q_ssa = self._ssa(q_out, qmask, train)
            if return_ssa:
                return q_ssa.astype(jnp.float32)
            out = jnp.concatenate([q_out, q_ssa], axis=-1)
            return self.out_head(out).astype(jnp.float32)

        # ONE combined (K+1)*B backbone + SSA pass — the reference also
        # batches query and keys through a single backbone call
        # (`models/hrnet.py:425-454`), so train-mode BN statistics cover
        # query and key shapes together. On TPU this halves (K=1) the number
        # of conv/norm kernel dispatches and doubles their batch.
        from csn_tpu.core.pyramid import concat_jax_batches

        B = batch.masks[0].shape[0]
        big = concat_jax_batches([batch, *keys])
        bmask = big.masks[0]                      # [(K+1)B, L0]
        feats = self._features(big, train)        # [(K+1)B, L0, d]
        ssa = self._ssa(feats, bmask, train)      # one batched MHA
        L0 = bmask.shape[1]
        q_out, qmask, q_ssa = feats[:B], bmask[:B], ssa[:B]
        if return_ssa:
            return q_ssa.astype(jnp.float32)

        # compatibility softmax over [self]+K (`models/hrnet.py:377-396`)
        pools = global_avg_pool(ssa, bmask).reshape(K + 1, B, self.d_model)
        q_glob = self.linear_q(pools[0])
        q_glob = q_glob / jnp.maximum(
            jnp.linalg.norm(q_glob, axis=-1, keepdims=True), 1e-12)
        k_glob = self.linear_k(pools.transpose(1, 0, 2))  # [B, K+1, d]
        k_glob = k_glob / jnp.maximum(
            jnp.linalg.norm(k_glob, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bd,bkd->bk", q_glob, k_glob) / (
            float(self.d_model) ** 0.5)
        comp = jax.nn.softmax(sim, axis=-1)  # [B, K+1]

        # all K cross attentions in one batched MHA call (query replicated)
        k_out = feats[B:].reshape(K * B, L0, self.d_model)
        k_mask = bmask[B:]
        q_rep = jnp.broadcast_to(
            q_out[None], (K,) + q_out.shape).reshape(K * B, L0, self.d_model)
        q_rep_mask = jnp.broadcast_to(
            qmask[None], (K,) + qmask.shape).reshape(K * B, L0)
        cross = self.mha(q_rep, k_out, k_out, k_mask, q_rep_mask, train=train)
        cross = cross.reshape(K, B, L0, self.d_model)
        cross = jnp.where(qmask[None, ..., None], cross, 0.0)
        csa = comp[:, 0, None, None] * q_ssa + jnp.einsum(
            "bk,kbld->bld", comp[:, 1:], cross)

        out = jnp.concatenate([q_out, csa.astype(q_out.dtype)], axis=-1)
        return self.out_head(out).astype(jnp.float32)

    def cp_forward(self, batch, col_axis: str = "col", train: bool = False):
        """Collection-parallel CSA forward (must run inside `shard_map` with
        `col_axis` in the mesh; see `parallel/cp.py`).

        This chip owns ONE collection member — mesh position 0 on
        `col_axis` holds the query batch, position k the k-th neighbor —
        and runs the expensive work (backbone + SSA, the ~129 ms/member
        slice of the step) entirely locally. The cross-shape head is then
        assembled with three cheap ICI collectives:

          * `all_gather` of the pooled SSA descriptors ([B, d] per member)
            for the compatibility softmax (`models/hrnet.py:377-396`);
          * a masked-`psum` broadcast of the query features/mask from
            position 0 (each key chip cross-attends its local K/V against
            the broadcast query);
          * `psum` of the compatibility-weighted per-member contributions:
            csa = comp[:,0]*q_ssa + sum_k comp[:,k]*cross_k, with each term
            computed where its K/V lives.

        The reference has no counterpart (single-GPU only, SURVEY §2.4);
        this is the TPU-native scaling axis for CSN's K-linear step cost.
        Train-mode BatchNorm normalizes with the LOCAL member's batch
        statistics, whereas the single-chip combined pass uses joint
        query+key statistics — the same approximation class as data
        parallelism (IN/LN configs are exact; eval mode is exact for all
        norms since running stats are used)."""
        cid = jax.lax.axis_index(col_axis)
        is_q = cid == 0
        mask = batch.masks[0]
        B = mask.shape[0]
        feats = self._features(batch, train)      # [B, L0, d] local member
        ssa = self._ssa(feats, mask, train)
        if self.k_neighbors == 0:
            raise ValueError("cp_forward needs k_neighbors > 0 (the col "
                             "mesh axis is the [self]+K collection)")

        # query-side broadcast: exactly one nonzero contributor per psum,
        # so the reduction is exact in the activation dtype
        q_out = jax.lax.psum(jnp.where(is_q, feats, jnp.zeros_like(feats)),
                             col_axis)
        qmask = jax.lax.psum(
            jnp.where(is_q, mask.astype(jnp.int32), 0), col_axis) > 0

        # compatibility softmax over [self]+K (`models/hrnet.py:377-396`):
        # pools gathered in cid order == the combined pass's concat order
        # [query, key_0, ...]; the [C, B, d] computation is tiny and runs
        # replicated on every chip
        pool = global_avg_pool(ssa, mask)                 # [B, d] f32
        pools = jax.lax.all_gather(pool, col_axis)        # [K+1, B, d]
        q_glob = self.linear_q(pools[0])
        q_glob = q_glob / jnp.maximum(
            jnp.linalg.norm(q_glob, axis=-1, keepdims=True), 1e-12)
        k_glob = self.linear_k(pools.transpose(1, 0, 2))  # [B, K+1, d]
        k_glob = k_glob / jnp.maximum(
            jnp.linalg.norm(k_glob, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bd,bkd->bk", q_glob, k_glob) / (
            float(self.d_model) ** 0.5)
        comp = jax.nn.softmax(sim, axis=-1)               # [B, K+1]

        # this member's contribution: position 0 contributes its own SSA,
        # key positions the cross attention of the broadcast query against
        # their local K/V — B shapes per chip vs the combined pass's K*B
        cross = self.mha(q_out, feats, feats, mask, qmask, train=train)
        cross = jnp.where(qmask[..., None], cross, 0.0)
        comp_c = jax.lax.dynamic_slice_in_dim(comp, cid, 1, axis=1)[:, 0]
        contrib = comp_c[:, None, None] * jnp.where(
            is_q, ssa, cross).astype(jnp.float32)
        csa = jax.lax.psum(contrib, col_axis)             # [B, L0, d] f32

        out = jnp.concatenate([q_out, csa.astype(q_out.dtype)], axis=-1)
        return self.out_head(out).astype(jnp.float32)

    def cache_features(self, batch, train: bool = False):
        """Per-shape cache for cached-collection CSA evaluation.

        Returns (fc_feats [B, L0, d] activation-dtype, ssa_pool [B, d] f32):
        exactly the two per-key quantities `__call__` derives from a key
        batch — `feats[B:]` (the cross-attention K/V, `models/hrnet.py:
        398-410`) and the mean-pooled SSA it feeds to the compatibility
        softmax (`models/hrnet.py:377-396`). Computing them once per
        collection shape replaces the reference's per-query neighbor
        re-forward (`lib/trainer_csn.py:442-454`)."""
        mask = batch.masks[0]
        feats = self._features(batch, train)
        ssa = self._ssa(feats, mask, train)
        return feats, global_avg_pool(ssa, mask)

    def csa_from_cache(self, batch, key_feats, key_pools, key_masks,
                       train: bool = False):
        """CSA forward with PRECOMPUTED neighbor features — the eval-time
        counterpart of `__call__(batch, keys)` that skips the K neighbor
        backbone passes entirely.

        key_feats [B, K, L0, d] (activation dtype), key_pools [B, K, d] f32,
        key_masks [B, K, L0] bool — per-query rows of a `cache_features`
        collection cache, gathered host-side (single chip) or over ICI
        (`parallel/collection.py`). Output matches `__call__` exactly in
        eval mode (BN running stats; dropout off)."""
        qmask = batch.masks[0]
        B, L0 = qmask.shape
        K = key_feats.shape[1]
        q_out = self._features(batch, train)
        q_ssa = self._ssa(q_out, qmask, train)

        # compatibility softmax over [self]+K (`models/hrnet.py:377-396`)
        q_pool = global_avg_pool(q_ssa, qmask)            # [B, d] f32
        pools = jnp.concatenate([q_pool[:, None], key_pools], axis=1)
        q_glob = self.linear_q(q_pool)
        q_glob = q_glob / jnp.maximum(
            jnp.linalg.norm(q_glob, axis=-1, keepdims=True), 1e-12)
        k_glob = self.linear_k(pools)                     # [B, K+1, d]
        k_glob = k_glob / jnp.maximum(
            jnp.linalg.norm(k_glob, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bd,bkd->bk", q_glob, k_glob) / (
            float(self.d_model) ** 0.5)
        comp = jax.nn.softmax(sim, axis=-1)               # [B, K+1]

        # cross attentions, keys laid out K-major to mirror feats[B:] in
        # __call__ (concat order [batch, key_0, key_1, ...])
        k_out = key_feats.astype(q_out.dtype).transpose(1, 0, 2, 3).reshape(
            K * B, L0, self.d_model)
        k_mask = key_masks.transpose(1, 0, 2).reshape(K * B, L0)
        q_rep = jnp.broadcast_to(
            q_out[None], (K,) + q_out.shape).reshape(K * B, L0, self.d_model)
        q_rep_mask = jnp.broadcast_to(
            qmask[None], (K,) + qmask.shape).reshape(K * B, L0)
        cross = self.mha(q_rep, k_out, k_out, k_mask, q_rep_mask, train=train)
        cross = cross.reshape(K, B, L0, self.d_model)
        cross = jnp.where(qmask[None, ..., None], cross, 0.0)
        csa = comp[:, 0, None, None] * q_ssa + jnp.einsum(
            "bk,kbld->bld", comp[:, 1:], cross)

        out = jnp.concatenate([q_out, csa.astype(q_out.dtype)], axis=-1)
        return self.out_head(out).astype(jnp.float32)


class HRNetSeg2S(HRNetSeg):
    FEAT_FACTOR = 2
    NUM_STAGES = 2


class HRNetSeg3S(HRNetSeg):
    FEAT_FACTOR = 2
    NUM_STAGES = 3


class HRNetSeg4S(HRNetSeg):
    FEAT_FACTOR = 2
    NUM_STAGES = 4


class HRNetSimCSN2S(HRNetSimCSN):
    FEAT_FACTOR = 4
    NUM_STAGES = 2


class HRNetSimCSN3S(HRNetSimCSN):
    FEAT_FACTOR = 2
    NUM_STAGES = 3


class HRNetSimCSN4S(HRNetSimCSN):
    FEAT_FACTOR = 2
    NUM_STAGES = 4
