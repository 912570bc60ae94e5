"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.data.pipeline import pyramid_spec_for_model, collate_shapes
from csn_tpu.models import load_model
from csn_tpu.parallel.dp import (
    make_dp_train_step, make_mesh, shard_stacked, stack_batches,
)
from csn_tpu.train.optim import make_optimizer


def make_shapes(B, n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        c = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        labels = ((c[:, 0] > 0).astype(np.int32) + 1)
        out.append((c, c.copy(), labels))
    return out


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_dp_train_step_runs_and_matches_single_device_grads():
    n_dev = 4
    mesh = make_mesh(n_dev)
    cls = load_model("HRNetSimCSN2S")
    spec = pyramid_spec_for_model(cls, num_points=48, voxel_size=0.3,
                                  conv1_kernel_size=3, shrink=1.5)
    model = cls(out_channels=4, conv1_kernel_size=3, k_neighbors=1,
                d_model=16, n_head=2, attn_dropout=0.0)

    per_dev_q = [collate_shapes(make_shapes(2, 48, seed=d), spec)
                 for d in range(n_dev)]
    per_dev_k = [collate_shapes(make_shapes(2, 48, seed=100 + d), spec)
                 for d in range(n_dev)]
    stacked_q = shard_stacked(stack_batches(per_dev_q), mesh)
    stacked_k = (shard_stacked(stack_batches(per_dev_k), mesh),)

    jb0 = per_dev_q[0].to_jax()
    kb0 = per_dev_k[0].to_jax()
    variables = jax.jit(
        lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), jb0, (kb0,))
    params, stats = variables["params"], variables.get("batch_stats", {})

    optimizer = make_optimizer(optimizer="SGD", lr=0.1, weight_decay=0.0)
    opt_state = optimizer.init(params)

    step = make_dp_train_step(model, optimizer, mesh, k_neighbors=1)
    new_params, new_stats, new_opt, loss = step(
        params, stats, opt_state, stacked_q, stacked_k,
        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).sum()), params,
        new_params)
    assert sum(jax.tree_util.tree_leaves(moved)) > 0

    # Cross-check the sharded loss against a manual single-device average of
    # the per-device losses (dropout disabled, BN stats differ per device but
    # loss_fn uses the same incoming stats).
    from csn_tpu.core.interp import interpolate_to_points
    from csn_tpu.train.losses import cross_entropy_ignore

    def one_loss(qb, kb):
        out = model.apply({"params": params, "batch_stats": stats}, qb, (kb,),
                          train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})[0]
        pl = interpolate_to_points(out, qb.interp_idx, qb.interp_w, qb.point_to_voxel)
        return float(cross_entropy_ignore(pl, qb.labels, 255, qb.point_mask))

    manual = np.mean([one_loss(per_dev_q[d].to_jax(), per_dev_k[d].to_jax())
                      for d in range(n_dev)])
    assert abs(manual - float(loss)) < 1e-3


def test_dp_eval_step_matches_single_device():
    from csn_tpu.parallel.dp import make_dp_eval_step
    from csn_tpu.core.interp import interpolate_to_points

    n_dev = 2
    mesh = make_mesh(n_dev)
    cls = load_model("HRNetSimCSN2S")
    spec = pyramid_spec_for_model(cls, num_points=48, voxel_size=0.3,
                                  conv1_kernel_size=3, shrink=1.5)
    model = cls(out_channels=4, conv1_kernel_size=3, k_neighbors=1,
                d_model=16, n_head=2, attn_dropout=0.0)
    per_dev_q = [collate_shapes(make_shapes(2, 48, seed=d), spec)
                 for d in range(n_dev)]
    per_dev_k = [collate_shapes(make_shapes(2, 48, seed=50 + d), spec)
                 for d in range(n_dev)]
    stacked_q = shard_stacked(stack_batches(per_dev_q), mesh)
    stacked_k = (shard_stacked(stack_batches(per_dev_k), mesh),)
    variables = jax.jit(lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), per_dev_q[0].to_jax(), (per_dev_k[0].to_jax(),))
    params, stats = variables["params"], variables.get("batch_stats", {})

    step = make_dp_eval_step(model, mesh, k_neighbors=1)
    out = np.asarray(step(params, stats, stacked_q, stacked_k))
    assert out.shape[0] == n_dev

    for d in range(n_dev):
        qb, kb = per_dev_q[d].to_jax(), per_dev_k[d].to_jax()
        logits = model.apply({"params": params, "batch_stats": stats}, qb,
                             (kb,), train=False)
        pl = np.asarray(interpolate_to_points(logits, qb.interp_idx, qb.interp_w, qb.point_to_voxel))
        np.testing.assert_allclose(out[d], pl, rtol=1e-4, atol=1e-5)


def test_sharded_retrieval_partial_masks_four_devices():
    """4-device mesh + trailing-padded masks (nq not divisible by n_dev)."""
    from csn_tpu.parallel.dp import sharded_retrieval_measure
    from csn_tpu.retrieval.graph import retrieval_measure

    rng = np.random.default_rng(0)
    q = rng.normal(size=(6, 12, 8)).astype(np.float32)
    k = rng.normal(size=(5, 12, 8)).astype(np.float32)
    qm = np.ones((6, 12), dtype=bool)
    km = np.ones((5, 12), dtype=bool)
    qm[2, 8:] = False
    km[1, 5:] = False
    mesh = make_mesh(4)
    got = sharded_retrieval_measure(q, qm, k, km, mesh)
    ref = retrieval_measure(q, qm, k, km, query_block=2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_retrieval_matches_single_device():
    """shard_map retrieval measure (queries sharded, keys replicated) equals
    the single-device blocked measure."""
    from csn_tpu.parallel.dp import make_mesh, sharded_retrieval_measure
    from csn_tpu.retrieval.graph import retrieval_measure

    rng = np.random.default_rng(0)
    nq, nk, P, d = 11, 7, 16, 8
    qf = rng.normal(size=(nq, P, d)).astype(np.float32)
    kf = rng.normal(size=(nk, P, d)).astype(np.float32)
    qm = rng.random((nq, P)) < 0.8
    km = rng.random((nk, P)) < 0.8
    qm[:, 0] = True
    km[:, 0] = True

    ref = retrieval_measure(qf, qm, kf, km)
    mesh = make_mesh(8)
    out = sharded_retrieval_measure(qf, qm, kf, km, mesh)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_trainer_matches_single_device(tmp_path):
    """`--data_parallel 8` through the PRODUCT path (CSNTrainer): eval is
    exactly the single-device computation (running BN stats); one DP train
    step produces a loss close to the single-device loss on the same shapes
    (only train-mode BN batch statistics differ: local-per-device vs
    global)."""
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    root = str(tmp_path / "partnet")
    write_synthetic_partnet(root, category="Display", n_train=8, n_val=8,
                            n_test=2, num_points=48)
    common = dict(
        model="HRNetSimCSN2S", partnet_path=root, partnet_category="Display",
        conv1_kernel_size=3, d_model=16, n_head=2, k_neighbors=1,
        num_points=48, level_shrink=1.5, lr=0.05, optimizer="SGD",
        scheduler="StepLR", seed=0, max_epoch=1, stat_freq=100,
        avg_feat=True,  # deterministic quantization -> identical batches
    )
    t1 = build_trainer(Config(**common, batch_size=8, test_batch_size=8,
                              log_dir=str(tmp_path / "l1")).normalized())
    t8 = build_trainer(Config(**common, batch_size=1, test_batch_size=1,
                              data_parallel=8,
                              log_dir=str(tmp_path / "l8")).normalized())
    assert t8.mesh is not None and t8.mesh.devices.size == 8
    t1.initialize()
    t8.initialize()
    # same seed -> identical init params
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t8.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    nbrs = [(i, [(i + 1) % 8]) for i in range(8)]
    t1.val_dataset.neighbors = list(nbrs)
    t8.val_dataset.neighbors = list(nbrs)
    r1 = t1.test_on(t1.val_dataset)
    r8 = t8.test_on(t8.val_dataset)
    assert r8[0] == pytest.approx(r1[0], rel=1e-4)      # loss
    assert r8[2] == pytest.approx(r1[2], abs=1e-3)      # Part IoU
    assert r8[3] == pytest.approx(r1[3], abs=1e-3)      # Shape IoU

    t1.train_dataset.neighbors = list(nbrs)
    t8.train_dataset.neighbors = list(nbrs)
    t1._train_iter()
    t8._train_iter()
    t1._close_prefetch()
    t8._close_prefetch()
    assert np.isfinite(t8.losses.avg)
    # same shapes, same params; only train-mode BN stats differ
    assert abs(t8.losses.avg - t1.losses.avg) \
        < 0.1 * abs(t1.losses.avg) + 0.05

    # DP shape-graph construction end-to-end (sharded descriptors + measure)
    t8.construct_shape_graph(recalculate=True)
    assert len(t8.train_dataset.neighbors) == 8
    assert all(len(nb) == 1 and nb[0] != i
               for i, nb in t8.train_dataset.neighbors)


def test_stack_batches_normalizes_mixed_wire():
    """Per-batch wire choices (int16-vs-int32 kmap/interp fallback, win!
    worklist overflow fallback) are made independently per device batch;
    stack_batches must normalize them — a naive stack either fails on tree
    structure or silently promotes int16 DELTA tables next to int32
    ABSOLUTE ones (the dtype-gated decode then reads deltas as absolutes).
    Simulates a device-1 fallback and checks device-0 is normalized too."""
    from csn_tpu.core.interp import decode_interp_idx
    from csn_tpu.core.pyramid import _map_levels, decode_kmap
    from csn_tpu.parallel.dp import stack_batches

    cls = load_model("HRNetSeg2S")
    spec = pyramid_spec_for_model(cls, num_points=900, voxel_size=0.07,
                                  conv1_kernel_size=3, shrink=1.5,
                                  use_windows=True)
    b0 = collate_shapes(make_shapes(2, 900, 0), spec).to_jax()
    b1 = collate_shapes(make_shapes(2, 900, 1), spec).to_jax()
    k16 = next(k for k in b1.kmaps
               if not k.startswith("win!") and b1.kmaps[k].dtype == jnp.int16)
    wink = next(k for k in b1.kmaps if k.startswith("win!"))
    assert b0.interp_idx.dtype == jnp.int16

    # simulate device-1 falling back to the int32 wire + losing a worklist
    n_in1 = b1.batch_size * b1.masks[_map_levels(k16)[0]].shape[1]
    km = {k: v for k, v in b1.kmaps.items() if k != wink}
    km[k16] = decode_kmap(km[k16], n_in1)
    ii1 = decode_interp_idx(b1.interp_idx, b1.point_to_voxel,
                            b1.batch_size * b1.masks[0].shape[1])
    b1 = b1.replace(kmaps=km, interp_idx=ii1)

    stacked = stack_batches([b0, b1])
    assert wink not in stacked.kmaps
    assert stacked.kmaps[k16].dtype == jnp.int32
    n_in0 = b0.batch_size * b0.masks[_map_levels(k16)[0]].shape[1]
    np.testing.assert_array_equal(
        np.asarray(stacked.kmaps[k16][0]),
        np.asarray(decode_kmap(b0.kmaps[k16], n_in0)))
    np.testing.assert_array_equal(np.asarray(stacked.kmaps[k16][1]),
                                  np.asarray(km[k16]))
    assert stacked.interp_idx.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(stacked.interp_idx[0]),
        np.asarray(decode_interp_idx(
            b0.interp_idx, b0.point_to_voxel,
            b0.batch_size * b0.masks[0].shape[1])))
    # uniform batches stay untouched (int16 wire preserved)
    b0b = collate_shapes(make_shapes(2, 900, 2), spec).to_jax()
    uni = stack_batches([b0, b0b])
    assert uni.kmaps[k16].dtype == jnp.int16
    assert uni.interp_idx.dtype == jnp.int16
    assert wink in uni.kmaps
