"""Multi-chip data-parallel training over a JAX device mesh.

The reference has no working distributed path — only an unused TF1 multi-GPU
tower solver with CPU gradient averaging (`MID-FC/ocnn_extraction/
ocnn.py:321-354`) and SLURM job-per-category farming (SURVEY.md §2.4/§5.8).
The TPU-native design is new: shapes are sharded over a `data` mesh axis with
`shard_map`; each chip runs the full model on its local shapes (kernel maps
are per-shape, so index spaces stay chip-local — no cross-chip gathers in the
conv path); gradients and BatchNorm statistics are averaged over ICI with
`psum` (the collective equivalent of the reference's CPU tower averaging,
including its device_0-only-BN quirk done right: all chips contribute).

Usage:
    mesh = make_mesh(8)
    step = make_dp_train_step(model, optimizer, mesh, k_neighbors=1)
    stacked = stack_batches([vb_dev0, vb_dev1, ...])  # one VoxelBatch per chip
    params, opt_state, batch_stats, loss = step(params, batch_stats,
                                                opt_state, stacked, rng, lr)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csn_tpu.core.interp import interpolate_to_points
from csn_tpu.train.losses import cross_entropy_ignore


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices for the mesh, have {len(devs)} "
                         f"(set XLA_FLAGS=--xla_force_host_platform_device_"
                         f"count={n} JAX_PLATFORMS=cpu for a virtual mesh)")
    return Mesh(np.array(devs[:n]), (axis,))


def stack_batches(host_batches: Sequence) -> "jax.Array":
    """Stack per-device VoxelBatches into one pytree with a leading device
    axis. Each per-device batch keeps its *local* kernel-map index space."""
    jax_batches = [b.to_jax() if hasattr(b, "to_jax") else b
                   for b in host_batches]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *jax_batches)


def shard_stacked(stacked, mesh: Mesh, axis: str = "data"):
    """Place a stacked batch so the leading axis lives on the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        stacked)


def make_dp_train_step(model, optimizer, mesh: Mesh, *, k_neighbors: int = 0,
                       ignore_label: int = 255, axis: str = "data"):
    """Returns a jitted (params, batch_stats, opt_state, stacked_query,
    stacked_keys, rng, lr) -> (params, batch_stats, opt_state, loss) step.

    stacked_query: VoxelBatch pytree with leading device axis.
    stacked_keys: tuple of k_neighbors stacked VoxelBatch pytrees.
    """
    shard_map = jax.shard_map

    def per_device_loss(params, batch_stats, qb, keys, rng):
        def loss_fn(p):
            if k_neighbors > 0:
                out, new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats}, qb, keys,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
            else:
                out, new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats}, qb,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
            point_logits = interpolate_to_points(out, qb.interp_idx,
                                                 qb.interp_w)
            loss = cross_entropy_ignore(point_logits, qb.labels, ignore_label,
                                        qb.point_mask)
            return loss, new_vars["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # ICI collectives: average grads / stats / loss across chips
        grads = jax.lax.pmean(grads, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        loss = jax.lax.pmean(loss, axis)
        return loss, grads, new_stats

    def unstack(tree):
        return jax.tree_util.tree_map(lambda x: x[0], tree)

    rep = P()
    shd = P(axis)

    def sharded_grads(params, batch_stats, stacked_q, stacked_keys, rng):
        def inner(params, batch_stats, sq, sk, rng):
            qb = unstack(sq)
            keys = tuple(unstack(k) for k in sk)
            return per_device_loss(params, batch_stats, qb, keys, rng[0])

        return shard_map(
            inner, mesh=mesh,
            in_specs=(rep, rep, shd, shd, shd),
            out_specs=rep,
            check_vma=False,
        )(params, batch_stats, stacked_q, stacked_keys, rng)

    @jax.jit
    def step(params, batch_stats, opt_state, stacked_q, stacked_keys, rng,
             lr=None):
        n_dev = mesh.devices.size
        rngs = jax.random.split(rng, n_dev)
        loss, grads, new_stats = sharded_grads(params, batch_stats, stacked_q,
                                               stacked_keys, rngs)
        if lr is not None:
            # schedule / plateau LR updates reach DP training the same way
            # BaseTrainer.set_lr does: via the injected hyperparam.
            opt_state.hyperparams["lr"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        return new_params, new_stats, new_opt, loss

    return step


def make_dp_eval_step(model, mesh: Mesh, *, k_neighbors: int = 0,
                      axis: str = "data"):
    """Sharded inference: returns per-device point logits gathered to host."""
    shard_map = jax.shard_map

    rep = P()
    shd = P(axis)

    def unstack(tree):
        return jax.tree_util.tree_map(lambda x: x[0], tree)

    @jax.jit
    def step(params, batch_stats, stacked_q, stacked_keys):
        def inner(params, batch_stats, sq, sk):
            qb = unstack(sq)
            keys = tuple(unstack(k) for k in sk)
            if k_neighbors > 0:
                out = model.apply({"params": params,
                                   "batch_stats": batch_stats}, qb, keys,
                                  train=False)
            else:
                out = model.apply({"params": params,
                                   "batch_stats": batch_stats}, qb,
                                  train=False)
            pl = interpolate_to_points(out, qb.interp_idx, qb.interp_w)
            return pl[None]

        return shard_map(inner, mesh=mesh, in_specs=(rep, rep, shd, shd),
                         out_specs=shd, check_vma=False)(
            params, batch_stats, stacked_q, stacked_keys)

    return step


def sharded_retrieval_measure(q_feats, q_mask, k_feats, k_mask, mesh: Mesh,
                              axis: str = "data", query_block: int = 4):
    """Shape-graph construction across chips: the query set is split over the
    mesh; every chip scans the full key set (descriptors are small — one
    [L0, d] block per shape — so replication over ICI is cheap, SURVEY.md
    §5.8). Returns the full [N_q, N_k] measure on host."""
    from csn_tpu.retrieval.graph import retrieval_measure

    n_dev = mesh.devices.size
    nq = q_feats.shape[0]
    per = -(-nq // n_dev)
    outs = [None] * n_dev

    # Host-driven split: each chip handles its slice via device placement.
    for d in range(n_dev):
        s, e = d * per, min((d + 1) * per, nq)
        if s >= e:
            continue
        with jax.default_device(mesh.devices.reshape(-1)[d]):
            outs[d] = retrieval_measure(q_feats[s:e], q_mask[s:e], k_feats,
                                        k_mask, query_block=query_block)
    return np.concatenate([o for o in outs if o is not None], axis=0)
