"""Sharded collection cache + ICI neighbor exchange for cached CSA eval.

SURVEY.md §5.8's sharded-collection design: the per-shape cached key
features (`HRNetSimCSN.cache_features` — cross-attention K/V + pooled SSA)
are sharded over the `data` mesh axis, each chip holding N/n_dev collection
shapes, instead of replicating the multi-GB collection on every chip. A
query's K neighbor rows live on arbitrary chips, so the fetch is a masked
local gather + `psum_scatter` over ICI: every chip gathers the full
replicated request set from its local shard (contributing zeros for rows
it does not own — each row is owned by exactly one chip), and one
reduce-scatter hands each chip exactly its own [B, K, L0, d] neighbor
block, moving every row across ICI once. This replaces the
reference's host-side neighbor re-forward at eval time
(`MinkowskiNet/lib/trainer_csn.py:442-454`) and the CPU feature cache it
keeps in `lib/csn_utils.py:66-83`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from csn_tpu.core.interp import interp_batch
from csn_tpu.train.losses import cross_entropy_ignore, predict_nonzero


def shard_collection(feats, pools, masks, mesh: Mesh, axis: str = "data"
                     ) -> Tuple[jax.Array, jax.Array, jax.Array, int]:
    """Place a host collection cache on the mesh, sharded over `axis`.

    feats [N, L0, d] (f16/bf16 fine), pools [N, d] f32, masks [N, L0] bool.
    N is zero-padded to a multiple of n_dev (padded rows are never indexed —
    neighbor ids are < N). Returns (feats, pools, masks, rows_per_chip).
    """
    n_dev = mesh.devices.size
    n = feats.shape[0]
    per = -(-n // n_dev)
    pad = per * n_dev - n

    def prep(x):
        x = np.asarray(x)
        x = np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return jax.device_put(
            jnp.asarray(x),
            NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return prep(feats), prep(pools), prep(masks), per


def exchange_rows(cf, cp, cm, idx_all, axis: str, per: int):
    """Inside `shard_map`: fetch global collection rows over ICI.

    cf [per, L0, d] / cp [per, d] / cm [per, L0] are the chip-local shard;
    idx_all [n_dev, ...] holds the GLOBAL row ids every chip wants,
    REPLICATED (each chip must see all requests — the rows a chip owns are
    data-dependent, so no static ppermute schedule exists). Each chip
    gathers its owned rows for the FULL request set (zeros for rows it
    does not own; every row is owned by exactly one chip) and one
    `psum_scatter` (reduce-scatter) per tensor hands chip c exactly its
    idx_all[c] block — each row crosses ICI once, the bandwidth-optimal
    distributed gather. Returns this chip's rows, leading dims
    idx_all.shape[1:]."""
    chip = jax.lax.axis_index(axis)
    n_dev = idx_all.shape[0]
    req = idx_all.shape[1:]
    flat = idx_all.reshape((-1,))                 # [n_dev * prod(req)]
    local = flat - chip * per
    valid = (local >= 0) & (local < per)
    li = jnp.clip(local, 0, per - 1)
    f = jnp.where(valid[..., None, None], cf[li], 0)
    p = jnp.where(valid[..., None], cp[li], 0)
    m = jnp.where(valid[..., None], cm[li], False).astype(jnp.int32)
    scat = lambda x: jax.lax.psum_scatter(  # noqa: E731
        x, axis, scatter_dimension=0, tiled=True)
    f, p, m = scat(f), scat(p), scat(m) > 0
    return (f.reshape(req + f.shape[1:]), p.reshape(req + p.shape[1:]),
            m.reshape(req + m.shape[1:]))


def _unstack(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def make_dp_cache_step(model, mesh: Mesh, axis: str = "data"):
    """Build the collection cache data-parallel: n_dev collection batches
    forwarded at once, one per chip.

    step(params, batch_stats, stacked) -> (feats [n_dev, B, L0, d],
    pools [n_dev, B, d]) with the leading axis sharded over the mesh.
    """
    rep, shd = P(), P(axis)

    @jax.jit
    def step(params, batch_stats, stacked):
        def inner(params, batch_stats, sq):
            qb = _unstack(sq)
            f, p = model.apply({"params": params, "batch_stats": batch_stats},
                               qb, method="cache_features")
            return f[None], p[None]

        return jax.shard_map(inner, mesh=mesh, in_specs=(rep, rep, shd),
                             out_specs=(shd, shd), check_vma=False)(
            params, batch_stats, stacked)

    return step


def make_dp_cached_eval_step(model, mesh: Mesh, *, per: int,
                             ignore_label: int = 255, axis: str = "data"):
    """Sharded cached-collection eval: per-chip queries + ICI neighbor fetch.

    step(params, batch_stats, stacked_q, cache_feats, cache_pools,
         cache_masks, idx) -> (loss [n_dev], point_logits, pred), outputs
    sharded over the mesh like `make_dp_trainer_steps`' eval_step.

    stacked_q: VoxelBatch pytree with leading device axis; cache_*: the
    `shard_collection` arrays; idx [n_dev, B, K] int32 GLOBAL neighbor ids
    per chip-local query (replicated into the exchange — see
    `exchange_rows`).
    """
    rep, shd = P(), P(axis)

    @jax.jit
    def step(params, batch_stats, stacked_q, cf, cp, cm, idx):
        def inner(params, batch_stats, sq, cf, cp, cm, idx_all):
            qb = _unstack(sq)
            kf, kp, km = exchange_rows(cf, cp, cm, idx_all, axis, per)
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              qb, kf, kp, km, method="csa_from_cache")
            point_logits = interp_batch(out, qb)
            loss = cross_entropy_ignore(point_logits, qb.labels, ignore_label,
                                        qb.point_mask)
            return (loss[None], point_logits[None],
                    predict_nonzero(point_logits)[None])

        return jax.shard_map(inner, mesh=mesh,
                             in_specs=(rep, rep, shd, shd, shd, shd, rep),
                             out_specs=(shd, shd, shd), check_vma=False)(
            params, batch_stats, stacked_q, cf, cp, cm, idx)

    return step
