"""Collection-parallel (mesh ('data', 'col')) tests on the virtual CPU mesh.

The col axis shards the [self]+K collection (parallel/cp.py +
HRNetSimCSN.cp_forward). With INSTANCE_NORM the per-member normalization is
identical to the single-chip combined pass, so logits AND gradients must
match the single-device path exactly (fp tolerance); BatchNorm configs are
the documented DP-class approximation and are only checked for finiteness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.core.interp import interpolate_to_points
from csn_tpu.data.pipeline import pyramid_spec_for_model, collate_shapes
from csn_tpu.models import load_model
from csn_tpu.models.layers import NormType
from csn_tpu.parallel.cp import (
    make_cp_mesh, make_cp_trainer_steps, shard_collection, stack_collection,
)
from csn_tpu.train.losses import cross_entropy_ignore, predict_nonzero


def make_shapes(B, n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        c = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        labels = ((c[:, 0] > 0).astype(np.int32) + 1)
        out.append((c, c.copy(), labels))
    return out


def build(k_neighbors, n_data, *, B=2, n=48, norm=NormType.INSTANCE_NORM):
    cls = load_model("HRNetSimCSN2S")
    spec = pyramid_spec_for_model(cls, num_points=n, voxel_size=0.3,
                                  conv1_kernel_size=3, shrink=1.5)
    model = cls(out_channels=4, conv1_kernel_size=3, k_neighbors=k_neighbors,
                d_model=16, n_head=2, attn_dropout=0.0, norm_type=norm)
    # per_data[d] = [query shard d, key_0 shard d, ...]
    per_data = [
        [collate_shapes(make_shapes(B, n, seed=97 * c + d), spec)
         for c in range(k_neighbors + 1)]
        for d in range(n_data)
    ]
    jb0 = per_data[0][0].to_jax()
    kbs0 = tuple(b.to_jax() for b in per_data[0][1:])
    variables = jax.jit(
        lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), jb0, kbs0)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return model, spec, per_data, params, stats


def single_device_logits(model, params, stats, qb, kbs):
    out = model.apply({"params": params, "batch_stats": stats}, qb, kbs,
                      train=False)
    return interpolate_to_points(out, qb.interp_idx, qb.interp_w,
                                 qb.point_to_voxel)


@pytest.mark.parametrize("k_neighbors,n_data", [(1, 2), (2, 2)])
@pytest.mark.slow
def test_cp_eval_matches_single_device_combined(k_neighbors, n_data):
    model, spec, per_data, params, stats = build(k_neighbors, n_data)
    mesh = make_cp_mesh(n_data, k_neighbors + 1)
    steps = make_cp_trainer_steps(model, mesh, k_neighbors=k_neighbors)
    stacked = shard_collection(stack_collection(per_data), mesh)

    loss, plog, pred = steps.eval_step(params, stats, stacked)

    losses = []
    for d in range(n_data):
        qb = per_data[d][0].to_jax()
        kbs = tuple(b.to_jax() for b in per_data[d][1:])
        ref = single_device_logits(model, params, stats, qb, kbs)
        np.testing.assert_allclose(np.asarray(plog[d]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(pred[d]),
                                      np.asarray(predict_nonzero(ref)))
        losses.append(float(cross_entropy_ignore(
            ref, qb.labels, 255, qb.point_mask)))
    assert float(loss) == pytest.approx(float(np.mean(losses)), rel=1e-4)


@pytest.mark.slow
def test_cp_grads_match_single_device():
    """With one data shard and INSTANCE_NORM, the collection-parallel
    gradient must equal the single-device combined-pass gradient — the
    masked-loss seeding + collective transposes count every path exactly
    once (the replicated-loss variant would be k_neighbors+1 x too big,
    which the tolerance would catch)."""
    k = 1
    model, spec, per_data, params, stats = build(k, n_data=1)
    mesh = make_cp_mesh(1, k + 1)
    steps = make_cp_trainer_steps(model, mesh, k_neighbors=k)
    stacked = shard_collection(stack_collection(per_data), mesh)

    loss, grads, new_stats, pred = steps.grad_step(
        params, stats, stacked, jax.random.PRNGKey(3))

    qb = per_data[0][0].to_jax()
    kbs = tuple(b.to_jax() for b in per_data[0][1:])

    def ref_loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, qb, kbs, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        pl = interpolate_to_points(out, qb.interp_idx, qb.interp_w,
                                   qb.point_to_voxel)
        return cross_entropy_ignore(pl, qb.labels, 255, qb.point_mask)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    assert float(loss) == pytest.approx(float(ref_l), rel=1e-5)
    flat_cp, _ = jax.tree_util.tree_flatten(grads)
    flat_ref, tdef = jax.tree_util.tree_flatten(ref_g)
    paths = jax.tree_util.tree_leaves_with_path(ref_g)
    for (path, r), c in zip(paths, flat_cp):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(r), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_cp_train_step_batchnorm_runs_finite():
    """BN configs: train-mode statistics are per-member (documented DP-class
    approximation) — assert the step runs, loss is finite, stats update."""
    k = 1
    model, spec, per_data, params, stats = build(
        k, n_data=2, norm=NormType.BATCH_NORM)
    mesh = make_cp_mesh(2, k + 1)
    steps = make_cp_trainer_steps(model, mesh, k_neighbors=k)
    stacked = shard_collection(stack_collection(per_data), mesh)
    loss, grads, new_stats, pred = steps.grad_step(
        params, stats, stacked, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).sum()),
        stats, new_stats)
    assert sum(jax.tree_util.tree_leaves(diffs)) > 0
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_cp_trainer_product_path(tmp_path):
    """`--collection_parallel --data_parallel 8 --k_neighbors 1` through the
    PRODUCT path (CSNTrainer): the train step runs on the (4, 2) mesh, the
    loss lands near the single-device combined-pass loss on the same shapes
    (train-mode BN statistics are per-member — DP-class tolerance), and the
    eval/test path (flat DP mesh) is untouched."""
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    root = str(tmp_path / "partnet")
    write_synthetic_partnet(root, category="Display", n_train=8, n_val=4,
                            n_test=2, num_points=48)
    common = dict(
        model="HRNetSimCSN2S", partnet_path=root, partnet_category="Display",
        conv1_kernel_size=3, d_model=16, n_head=2, k_neighbors=1,
        num_points=48, level_shrink=1.5, lr=0.05, optimizer="SGD",
        scheduler="StepLR", seed=0, max_epoch=1, stat_freq=100,
        avg_feat=True,
    )
    t1 = build_trainer(Config(**common, batch_size=8, test_batch_size=4,
                              log_dir=str(tmp_path / "l1")).normalized())
    tcp = build_trainer(Config(**common, batch_size=2, test_batch_size=1,
                               data_parallel=8, collection_parallel=True,
                               log_dir=str(tmp_path / "lcp")).normalized())
    assert tcp.n_col == 2 and tcp.n_data == 4
    assert tcp.cp_mesh.shape == {"data": 4, "col": 2}
    t1.initialize()
    tcp.initialize()
    nbrs = [(i, [(i + 1) % 8]) for i in range(8)]
    t1.train_dataset.neighbors = list(nbrs)
    tcp.train_dataset.neighbors = list(nbrs)
    # Host-copy: _apply_step donates params/opt_state (trainer.py), so the
    # pre-update device buffers are deleted by the update — holding a live
    # device reference across _train_iter() is a contract violation (see
    # test_apply_step_donates_param_buffers).
    p0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), tcp.params)
    t1._train_iter()
    tcp._train_iter()
    t1._close_prefetch()
    tcp._close_prefetch()
    assert np.isfinite(tcp.losses.avg)
    assert abs(tcp.losses.avg - t1.losses.avg) \
        < 0.1 * abs(t1.losses.avg) + 0.05
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).sum()), p0, tcp.params)
    assert sum(jax.tree_util.tree_leaves(moved)) > 0
    # eval path (flat DP mesh over all 8 devices) still works under the flag
    tcp.val_dataset.neighbors = [(i, [(i + 1) % 4]) for i in range(4)]
    r = tcp.test_on(tcp.val_dataset)
    assert np.isfinite(r[0])


def test_cp_trainer_flag_validation(tmp_path):
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    root = str(tmp_path / "partnet")
    write_synthetic_partnet(root, category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    common = dict(
        model="HRNetSimCSN2S", partnet_path=root, partnet_category="Display",
        conv1_kernel_size=3, d_model=16, n_head=2, num_points=48,
        level_shrink=1.5, seed=0, log_dir=str(tmp_path / "l"))
    with pytest.raises(ValueError, match="divide"):
        build_trainer(Config(**common, batch_size=1, k_neighbors=2,
                             data_parallel=8,
                             collection_parallel=True).normalized())
    with pytest.raises(ValueError, match="k_neighbors >= 1"):
        build_trainer(Config(**common, batch_size=1, k_neighbors=0,
                             data_parallel=8,
                             collection_parallel=True).normalized())


def test_cp_mesh_validation():
    with pytest.raises(ValueError, match="col mesh axis"):
        mesh = make_cp_mesh(2, 2)
        model, *_ = build(2, 1)[0:1]
        make_cp_trainer_steps(model, mesh, k_neighbors=2)
    with pytest.raises(ValueError, match="k_neighbors >= 1"):
        mesh = make_cp_mesh(2, 2)
        model = load_model("HRNetSimCSN2S")(
            out_channels=4, conv1_kernel_size=3, k_neighbors=0, d_model=16,
            n_head=2)
        make_cp_trainer_steps(model, mesh, k_neighbors=0)
