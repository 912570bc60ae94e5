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

from csn_tpu.core.interp import interp_batch
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
    axis. Each per-device batch keeps its *local* kernel-map index space.

    Per-batch OPTIONAL wire choices are normalized first — they are made
    independently per batch, and a mixed stack would either fail (tree
    structure) or silently corrupt (jnp.stack promotes an int16 DELTA wire
    table next to an int32 ABSOLUTE one to int32, and the dtype-gated
    decode then skips it):
    * `win!` worklists present in only SOME batches (WindowOverflow
      fallback) are dropped from all, loudly;
    * int16 kmap / interp_idx wire tables mixed with int32 fallbacks are
      decoded host-side (decode_kmap / decode_interp_idx are identity on
      int32);
    * `stem_cells` present in only some batches is dropped from all."""
    import logging

    from csn_tpu.core.interp import decode_interp_idx
    from csn_tpu.core.pyramid import _map_levels, decode_kmap

    jax_batches = [b.to_jax() if hasattr(b, "to_jax") else b
                   for b in host_batches]
    keysets = [set(b.kmaps) for b in jax_batches]
    common = set.intersection(*keysets)
    dropped = set.union(*keysets) - common
    if dropped:
        logging.warning(
            "stack_batches: dropping %s (absent in some device batches — "
            "worklist-overflow fallback); the affected kernels use the XLA "
            "gather path on ALL devices this step", sorted(dropped))
    norm = []
    for b in jax_batches:
        km = {k: v for k, v in b.kmaps.items() if k in common}
        for k in km:
            if not k.startswith("win!") and any(
                    jb.kmaps[k].dtype != km[k].dtype for jb in jax_batches):
                src_l = _map_levels(k)[0]
                km[k] = decode_kmap(
                    km[k], b.batch_size * b.masks[src_l].shape[1])
        ii = b.interp_idx
        if any(jb.interp_idx.dtype != ii.dtype for jb in jax_batches):
            ii = decode_interp_idx(
                ii, b.point_to_voxel, b.batch_size * b.masks[0].shape[1])
        sc = b.stem_cells
        if any((jb.stem_cells is None) != (sc is None)
               for jb in jax_batches):
            sc = None
        norm.append(b.replace(kmaps=km, interp_idx=ii, stem_cells=sc))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *norm)


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
            point_logits = interp_batch(out, qb)
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
            pl = interp_batch(out, qb)
            return pl[None]

        return shard_map(inner, mesh=mesh, in_specs=(rep, rep, shd, shd),
                         out_specs=shd, check_vma=False)(
            params, batch_stats, stacked_q, stacked_keys)

    return step


def make_dp_trainer_steps(model, mesh: Mesh, *, k_neighbors: int = 0,
                          ignore_label: int = 255, axis: str = "data"):
    """Trainer-shaped DP steps (slot-in replacements for BaseTrainer's jitted
    single-device functions; csn_tpu/train/trainer.py wires them when
    `--data_parallel N` is set):

      grad_step(params, batch_stats, stacked_q, stacked_keys, rng)
          -> (loss, grads, new_stats, pred[n_dev, B, P])
      eval_step(params, batch_stats, stacked_q, stacked_keys)
          -> (loss[n_dev], point_logits[n_dev, ...], pred[n_dev, ...])
      ssa_step(params, batch_stats, stacked_q) -> ssa[n_dev, B, L0, d]

    Batches are stacked per-device pytrees (`stack_batches`); grads / BN
    stats / train loss are pmean'd over ICI, eval outputs stay sharded.
    """
    shard_map = jax.shard_map
    rep, shd = P(), P(axis)

    def unstack(tree):
        return jax.tree_util.tree_map(lambda x: x[0], tree)

    def apply_model(params, batch_stats, qb, keys, train, mutable, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        args = (qb, keys) if k_neighbors > 0 else (qb,)
        if mutable:
            return model.apply(variables, *args, train=train,
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
        return model.apply(variables, *args, train=train)

    @jax.jit
    def grad_step(params, batch_stats, stacked_q, stacked_keys, rng):
        n_dev = mesh.devices.size
        rngs = jax.random.split(rng, n_dev)

        def inner(params, batch_stats, sq, sk, r):
            qb = unstack(sq)
            keys = tuple(unstack(k) for k in sk)

            def loss_fn(p):
                out, new_vars = apply_model(p, batch_stats, qb, keys, True,
                                            True, r[0])
                point_logits = interp_batch(out, qb)
                loss = cross_entropy_ignore(point_logits, qb.labels,
                                            ignore_label, qb.point_mask)
                return loss, (new_vars["batch_stats"], point_logits)

            (loss, (new_stats, point_logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            from csn_tpu.train.losses import predict_nonzero

            pred = predict_nonzero(point_logits)
            return (jax.lax.pmean(loss, axis), jax.lax.pmean(grads, axis),
                    jax.lax.pmean(new_stats, axis), pred[None])

        return shard_map(inner, mesh=mesh,
                         in_specs=(rep, rep, shd, shd, shd),
                         out_specs=(rep, rep, rep, shd),
                         check_vma=False)(params, batch_stats, stacked_q,
                                          stacked_keys, rngs)

    @jax.jit
    def eval_step(params, batch_stats, stacked_q, stacked_keys):
        def inner(params, batch_stats, sq, sk):
            qb = unstack(sq)
            keys = tuple(unstack(k) for k in sk)
            out = apply_model(params, batch_stats, qb, keys, False, False,
                              None)
            point_logits = interp_batch(out, qb)
            loss = cross_entropy_ignore(point_logits, qb.labels, ignore_label,
                                        qb.point_mask)
            from csn_tpu.train.losses import predict_nonzero

            return loss[None], point_logits[None], predict_nonzero(
                point_logits)[None]

        return shard_map(inner, mesh=mesh, in_specs=(rep, rep, shd, shd),
                         out_specs=(shd, shd, shd), check_vma=False)(
            params, batch_stats, stacked_q, stacked_keys)

    @jax.jit
    def ssa_step(params, batch_stats, stacked_q):
        def inner(params, batch_stats, sq):
            qb = unstack(sq)
            ssa = model.apply({"params": params, "batch_stats": batch_stats},
                              qb, train=False, return_ssa=True)
            return ssa[None]

        return shard_map(inner, mesh=mesh, in_specs=(rep, rep, shd),
                         out_specs=shd, check_vma=False)(
            params, batch_stats, stacked_q)

    return grad_step, eval_step, ssa_step


def sharded_retrieval_measure(q_feats, q_mask, k_feats, k_mask, mesh: Mesh,
                              axis: str = "data", key_chunk: int = 8,
                              query_block: int = 32):
    """Shape-graph construction as a REAL mesh computation (shard_map): the
    KEY descriptor set is sharded over the `data` axis (SURVEY.md §5.8 —
    replicating it would put the whole multi-GB collection on every chip;
    sharded, Table-scale keys fit per-chip HBM), query blocks are streamed
    replicated, and every chip computes the [bq, N_k/n_dev] column slice of
    the mean-of-max cosine measure. Returns the full [N_q, N_k] on host."""
    from csn_tpu.retrieval.graph import _retrieval_block

    n_dev = mesh.devices.size
    nq = q_feats.shape[0]
    nk = k_feats.shape[0]
    per_k = -(-nk // n_dev)
    pad_k = per_k * n_dev - nk
    # zero-pad + mask=False keys: their columns come back as -inf and are
    # sliced away below
    kf = np.pad(np.asarray(k_feats, np.float32),
                ((0, pad_k), (0, 0), (0, 0)))
    km = np.pad(np.asarray(k_mask), ((0, pad_k), (0, 0)))
    q_feats = np.asarray(q_feats, np.float32)
    q_mask = np.asarray(q_mask)

    shd = jax.sharding.NamedSharding(mesh, P(axis))
    kf_dev = jax.device_put(jnp.asarray(kf), shd)
    km_dev = jax.device_put(jnp.asarray(km), shd)

    fn = jax.jit(jax.shard_map(
        lambda a, b, c, d: _retrieval_block(a, b, c, d, key_chunk=key_chunk),
        mesh=mesh, in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(None, axis), check_vma=False))
    rows = []
    for s in range(0, nq, query_block):
        e = min(s + query_block, nq)
        qb, qm = q_feats[s:e], q_mask[s:e]
        if qb.shape[0] < query_block:  # static shapes for jit cache
            padn = query_block - qb.shape[0]
            qb = np.concatenate([qb, np.repeat(qb[-1:], padn, 0)], axis=0)
            qm = np.concatenate([qm, np.repeat(qm[-1:], padn, 0)], axis=0)
        rows.append((fn(jnp.asarray(qb), jnp.asarray(qm), kf_dev, km_dev),
                     e - s))
    return np.concatenate([np.asarray(r)[:n] for r, n in rows],
                          axis=0)[:, :nk]
