"""MID-FC multi-chip parallelism: data-parallel batches x sequence-parallel
point shards over a ('data', 'seq') mesh.

The reference trains MID-FC heads strictly single-GPU (SLURM farms whole
categories to separate jobs, `MID-FC/run_training.py:107-120`); its only
memory lever is the fixed 20x500 attention chunking (`csa_models.py:83-91`).
The TPU-native design exploits exactly that chunking: block-diagonal
attention makes the 10000-point axis embarrassingly parallel across chips,
so we shard it ('seq' axis) — each chip holds P/n_seq points of the query
AND of every neighbor, runs the 11-MHA CSA stack on its slice, and only the
mean-pooled compatibility descriptors cross ICI (one pmean of [B, d] per
pooled shape — a few KB). Activations per chip drop ~linearly in n_seq:
the B=8 protocol that HBM-OOMs on one v5e chip (23.8 GB of MHA fwd+bwd
activations, STATUS.md) fits at n_seq >= 2. The 'data' axis shards the
batch with psum'd gradients, the standard DP recipe (parallel/dp.py).

chunk_size=None (full attention, this framework's documented upgrade path)
stays exact under 'seq' sharding too: the MHA core switches to
`ring_attention` (ops/attention.py) — K/V blocks ppermute around the ring
with online-softmax accumulation, so every query attends the global point
set at O(Lq_local * Lk_local) live scores per step.

Exactness: the sharded loss psums (nll_sum, valid_count) and divides once,
reproducing the single-device masked mean bit-for-bit regardless of how the
positive labels distribute over shards; pooled descriptors pmean equal-size
local means. Gradients therefore match the single-device step exactly
(tests/test_midfc_parallel.py asserts it at dropout=0; with dropout the
masks are drawn per-chip via fold_in(axis_index) — a different but equally
valid stream).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from csn_tpu.train.losses import cross_entropy_positive_sum

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_midfc_mesh(n_data: int = 1, n_seq: int = 1) -> Mesh:
    devs = jax.devices()
    need = n_data * n_seq
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices for a ({n_data},{n_seq}) mesh, have "
            f"{len(devs)} (set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={need} JAX_PLATFORMS=cpu for a virtual mesh)")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_seq),
                (DATA_AXIS, SEQ_AXIS))


@dataclasses.dataclass
class MidfcParallelSteps:
    """Slot-in replacements for MidfcRunner's jitted single-device steps
    (same signatures; `neighbors` is None on the SSA surfaces)."""

    grad: Callable      # (params, feats, labels, neighbors, rng)->(loss,grads)
    eval: Callable      # (params, feats, neighbors) -> logits [B, P, C]
    ssa_feats: Callable  # (params, feats) -> [B, P, d]


def _check_shapes(mesh: Mesh, feats, chunk_size: Optional[int]):
    n_data = mesh.shape[DATA_AXIS]
    n_seq = mesh.shape[SEQ_AXIS]
    b, p = feats.shape[0], feats.shape[1]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    if p % n_seq:
        raise ValueError(f"points {p} not divisible by seq axis {n_seq}")
    if chunk_size is not None and (p // n_seq) % chunk_size:
        raise ValueError(
            f"local points {p // n_seq} not divisible by chunk_size "
            f"{chunk_size}; pick n_seq so P/n_seq is a chunk multiple")
    # chunk_size=None (full attention) + n_seq > 1 is handled by
    # ring_attention (ops/attention.py): CrossShapeAt.setup routes the MHA
    # core through a ppermute ring of K/V blocks when seq_axis is set with
    # chunk_size None, so every query still attends the GLOBAL point set.


def make_midfc_steps(model, attention_type: str, mesh: Mesh
                     ) -> MidfcParallelSteps:
    """Build sharded grad/eval/ssa-feature steps for a CrossShapeAt model.

    `model` is the plain (seq_axis=None) module — its params are what the
    runner owns/checkpoints; a seq-aware clone (same param tree) runs inside
    shard_map when the mesh has a non-trivial 'seq' extent.
    """
    is_csa = attention_type == "csa"
    n_seq = mesh.shape[SEQ_AXIS]
    sharded_model = model.clone(seq_axis=SEQ_AXIS) if n_seq > 1 else model
    chunk = model.chunk_size

    rep = P()
    feats_spec = P(DATA_AXIS, SEQ_AXIS, None)
    labels_spec = P(DATA_AXIS, SEQ_AXIS)
    neigh_spec = P(DATA_AXIS, None, SEQ_AXIS, None)

    def fold_chip(rng):
        idx = (jax.lax.axis_index(DATA_AXIS) * n_seq
               + jax.lax.axis_index(SEQ_AXIS))
        return jax.random.fold_in(rng, idx)

    def apply_logits(params, feats, neighbors, train, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        if is_csa:
            return sharded_model.apply({"params": params}, feats, neighbors,
                                       train=train, rngs=rngs)
        return sharded_model.apply({"params": params}, feats,
                                   train=train, rngs=rngs)

    def grad_inner(params, feats, labels, neighbors, rng):
        def loss_fn(p):
            logits = apply_logits(p, feats, neighbors, True, fold_chip(rng))
            s, n = cross_entropy_positive_sum(logits, labels)
            return s, n

        (s, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        s = jax.lax.psum(s, (DATA_AXIS, SEQ_AXIS))
        n = jax.lax.psum(n, (DATA_AXIS, SEQ_AXIS))
        grads = jax.lax.psum(grads, (DATA_AXIS, SEQ_AXIS))
        denom = jnp.maximum(n, 1).astype(jnp.float32)
        loss = s / denom
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        # NaN-loss zeroing, the single-device rule (`ssa_training.py:142-143`)
        isnan = jnp.isnan(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(isnan, jnp.zeros_like(g), g), grads)
        loss = jnp.where(isnan, 0.0, loss)
        return loss, grads

    def eval_inner(params, feats, neighbors):
        return apply_logits(params, feats, neighbors, False)

    def ssa_inner(params, feats):
        from csn_tpu.midfc.model import CrossShapeAt

        return sharded_model.apply({"params": params}, feats,
                                   method=CrossShapeAt.get_ssa_feats)

    grad_in = (rep, feats_spec, labels_spec) + (
        (neigh_spec,) if is_csa else ()) + (rep,)
    eval_in = (rep, feats_spec) + ((neigh_spec,) if is_csa else ())

    grad_sharded = jax.jit(jax.shard_map(
        grad_inner if is_csa else
        (lambda p, f, l, r: grad_inner(p, f, l, None, r)),
        mesh=mesh, in_specs=grad_in, out_specs=(rep, rep), check_vma=False))
    eval_sharded = jax.jit(jax.shard_map(
        eval_inner if is_csa else (lambda p, f: eval_inner(p, f, None)),
        mesh=mesh, in_specs=eval_in, out_specs=feats_spec, check_vma=False))
    ssa_sharded = jax.jit(jax.shard_map(
        ssa_inner, mesh=mesh, in_specs=(rep, feats_spec),
        out_specs=feats_spec, check_vma=False))

    def grad_step(params, feats, labels, neighbors, rng):
        _check_shapes(mesh, feats, chunk)
        if is_csa:
            return grad_sharded(params, feats, labels, neighbors, rng)
        assert neighbors is None
        return grad_sharded(params, feats, labels, rng)

    def eval_step(params, feats, neighbors):
        _check_shapes(mesh, feats, chunk)
        if is_csa:
            return eval_sharded(params, feats, neighbors)
        assert neighbors is None
        return eval_sharded(params, feats)

    def ssa_step(params, feats):
        _check_shapes(mesh, feats, chunk)
        return ssa_sharded(params, feats)

    return MidfcParallelSteps(grad=grad_step, eval=eval_step,
                              ssa_feats=ssa_step)
