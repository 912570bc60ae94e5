"""Collection parallelism: shard the [self]+K shape collection over chips.

The CSN train step's cost is linear in K (~129 ms per neighbor on v5e at
the bench protocol: the combined (K+1)*B backbone pass dominates). Data
parallelism splits the batch axis B; this module adds the OTHER axis — a
2-D mesh ``('data', 'col')`` where each ``col`` position owns one
collection member (0 = the query batch, k = the k-th neighbor batch) and
runs backbone + SSA on it locally. The cross-shape head is stitched with
ICI collectives inside the model (`HRNetSimCSN.cp_forward`): an
`all_gather` of pooled SSA descriptors, a masked-`psum` broadcast of the
query features, and a `psum` of compatibility-weighted per-member CSA
contributions.

The reference is single-GPU everywhere (SURVEY.md §2.4 — it scales K by
gradient accumulation, `MinkowskiNet/README.md:69-77`); this axis is new
TPU-native design, the natural one for CSN because members of the
collection are independent until the tiny head.

Semantics note: train-mode BatchNorm normalizes each member with its own
batch statistics, while the single-chip combined pass uses joint
query+key statistics — the same approximation data parallelism makes
across the batch axis. IN/LN configurations and eval mode are exact
(tests assert logit and gradient parity with the single-device combined
pass under IN).

Usage:
    mesh = make_cp_mesh(n_data=4, n_col=k_neighbors + 1)
    steps = make_cp_trainer_steps(model, mesh, k_neighbors=K)
    stacked = stack_collection(
        [[q_shard0, k0_shard0], [q_shard1, k0_shard1], ...])
    loss, grads, stats, pred = steps.grad_step(params, batch_stats,
                                               stacked, rng)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from csn_tpu.core.interp import interp_batch
from csn_tpu.train.losses import cross_entropy_ignore, predict_nonzero


def make_cp_mesh(n_data: int, n_col: int, *, data_axis: str = "data",
                 col_axis: str = "col") -> Mesh:
    """2-D device mesh [n_data, n_col]. The col axis should ride the
    faster interconnect dimension when the physical topology allows — the
    query-feature broadcast and the csa psum ([B, L0, d] each) are the
    per-step collectives."""
    devs = jax.devices()
    need = n_data * n_col
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices ({n_data}x{n_col} mesh), have {len(devs)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count={need} "
            f"JAX_PLATFORMS=cpu for a virtual mesh)")
    return Mesh(np.array(devs[:need]).reshape(n_data, n_col),
                (data_axis, col_axis))


def stack_collection(per_data: Sequence[Sequence]) -> "jax.Array":
    """Stack host batches for a ('data', 'col') mesh.

    per_data[d][c] is the VoxelBatch for data shard d, collection member c
    (c=0 the query shard, c=k the k-th neighbor shard). Returns one stacked
    pytree whose leading axis is the row-major (d, c) flattening — exactly
    the order `P(('data', 'col'))` shards a [n_data * n_col, ...] axis over
    the mesh. Wire-choice normalization (mixed int16/int32 tables, dropped
    win! worklists) is inherited from `stack_batches`."""
    from csn_tpu.parallel.dp import stack_batches

    flat = [b for row in per_data for b in row]
    return stack_batches(flat)


def shard_collection(stacked, mesh: Mesh, *, data_axis: str = "data",
                     col_axis: str = "col"):
    """Place a stack_collection pytree so its leading [n_data * n_col]
    axis lives on the 2-D mesh (row-major over (data, col))."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P((data_axis, col_axis),
                                     *([None] * (x.ndim - 1))))),
        stacked)


class CPTrainerSteps:
    """Jitted collection-parallel steps (see make_cp_trainer_steps)."""

    def __init__(self, grad_step, eval_step):
        self.grad_step = grad_step
        self.eval_step = eval_step


def make_cp_trainer_steps(model, mesh: Mesh, *, k_neighbors: int,
                          ignore_label: int = 255, data_axis: str = "data",
                          col_axis: str = "col") -> CPTrainerSteps:
    """Collection-parallel train/eval steps over a ('data', 'col') mesh.

      grad_step(params, batch_stats, stacked, rng)
          -> (loss, grads, new_stats, pred[n_data, B, P])
      eval_step(params, batch_stats, stacked)
          -> (loss, point_logits[n_data, B, P, C], pred[n_data, B, P])

    `stacked` comes from `stack_collection`. Gradients are the mean over
    data shards of d(query loss)/d(params), each collection member's path
    counted exactly once: grad is taken per chip INSIDE shard_map of the
    PRE-psum masked loss (col-0's query CE, zero elsewhere — see
    local_loss for why differentiating the replicated value would
    over-count n_col times); the collective transposes (psum -> psum of
    cotangents) route the query-loss cotangent back through each key
    chip's cross-attention and backbone, so the all-chip gradient psum is
    the exact full gradient (tests/test_cp.py asserts it against the
    single-device combined pass).
    """
    if k_neighbors < 1:
        raise ValueError("collection parallelism needs k_neighbors >= 1")
    n_col = mesh.shape[col_axis]
    if n_col != k_neighbors + 1:
        raise ValueError(
            f"col mesh axis ({n_col}) must equal k_neighbors+1 "
            f"({k_neighbors + 1}) — one chip per collection member")
    shard_map = jax.shard_map
    rep = P()
    shd = P((data_axis, col_axis))

    def unstack(tree):
        return jax.tree_util.tree_map(lambda x: x[0], tree)

    def local_loss(params, batch_stats, lb, rng, train):
        """Per-chip forward of the collection-parallel step.

        Returns (masked_loss, loss_rep, new_stats, pred, plog):
        `masked_loss` is col-0's query CE and ZERO on key positions — the
        value grad_step differentiates. This masking is load-bearing for
        gradient correctness: differentiating the replicated (psum'd) loss
        on every chip would seed n_col cotangents into the shared backward
        collectives and over-count every gradient n_col times. With the
        pre-psum masked loss, only the query chip seeds, the psum
        transposes route its cotangent through each key chip's
        cross-attention/backbone, and the all-chip gradient psum counts
        every path exactly once. `loss_rep`/`pred`/`plog` are the
        replicated-over-col reporting values (aux, never differentiated).
        """
        cid = jax.lax.axis_index(col_axis)
        is_q = cid == 0
        kw = dict(method="cp_forward", col_axis=col_axis, train=train)
        if train:
            out, new_vars = model.apply(
                {"params": params, "batch_stats": batch_stats}, lb,
                mutable=["batch_stats"], rngs={"dropout": rng}, **kw)
            new_stats = new_vars["batch_stats"]
        else:
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, lb, **kw)
            new_stats = batch_stats
        # interp + CE with the LOCAL member's tables/labels — only col 0's
        # (the query's) survives the mask; key positions run the same
        # program on their own member (SPMD) and contribute zero
        point_logits = interp_batch(out, lb)
        ce = cross_entropy_ignore(point_logits, lb.labels, ignore_label,
                                  lb.point_mask)
        masked_loss = jnp.where(is_q, ce, 0.0)
        loss_rep = jax.lax.psum(masked_loss, col_axis)
        pred = predict_nonzero(point_logits)
        pred = jax.lax.psum(jnp.where(is_q, pred, jnp.zeros_like(pred)),
                            col_axis)
        plog = jax.lax.psum(
            jnp.where(is_q, point_logits, jnp.zeros_like(point_logits)),
            col_axis)
        return masked_loss, loss_rep, new_stats, pred, plog

    @jax.jit
    def grad_step(params, batch_stats, stacked, rng):
        def inner(params, batch_stats, s, rng):
            lb = unstack(s)
            did = jax.lax.axis_index(data_axis)
            cid = jax.lax.axis_index(col_axis)
            r = jax.random.fold_in(rng, did * n_col + cid)

            def loss_fn(p):
                masked, loss_rep, new_stats, pred, _ = local_loss(
                    p, batch_stats, lb, r, True)
                return masked, (loss_rep, new_stats, pred)

            (_, (loss, new_stats, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # local gradients carry only this chip's paths (the collective
            # transposes already routed cross-chip cotangents); sum over
            # the collection, mean over data shards
            grads = jax.lax.psum(grads, col_axis)
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            new_stats = jax.lax.pmean(new_stats, (data_axis, col_axis))
            return loss, grads, new_stats, pred[None]

        return shard_map(
            inner, mesh=mesh, in_specs=(rep, rep, shd, rep),
            out_specs=(rep, rep, rep, P(data_axis)),
            check_vma=False)(params, batch_stats, stacked, rng)

    @jax.jit
    def eval_step(params, batch_stats, stacked):
        def inner(params, batch_stats, s):
            lb = unstack(s)
            _, loss, _, pred, plog = local_loss(params, batch_stats, lb,
                                                None, False)
            loss = jax.lax.pmean(loss, data_axis)
            return loss, plog[None], pred[None]

        return shard_map(
            inner, mesh=mesh, in_specs=(rep, rep, shd),
            out_specs=(rep, P(data_axis), P(data_axis)),
            check_vma=False)(params, batch_stats, stacked)

    return CPTrainerSteps(grad_step, eval_step)
