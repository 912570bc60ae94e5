"""Cached-collection CSA evaluation.

`HRNetSimCSN.csa_from_cache` consumes precomputed per-key features
(`cache_features`) instead of re-running the K neighbor backbones per query
(the reference re-forwards every neighbor at eval time,
`lib/trainer_csn.py:442-454`). Parity requirement: in eval mode the cached
path must reproduce `__call__(batch, keys)` — same params, BN running stats,
dropout off.
"""

import numpy as np
import jax
import jax.numpy as jnp

from csn_tpu.data.pipeline import pyramid_spec_for_model, collate_shapes
from csn_tpu.models import load_model


def make_shapes(B=2, n=80, seed=0):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        coords = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        feats = coords.copy()
        labels = rng.integers(0, 5, size=n).astype(np.int32)
        shapes.append((coords, feats, labels))
    return shapes


def _setup(K=2, B=2, d_model=32, n_head=4):
    cls = load_model("HRNetSimCSN3S")
    spec = pyramid_spec_for_model(cls, num_points=80, voxel_size=0.2,
                                  conv1_kernel_size=3, shrink=1.5)
    qb = collate_shapes(make_shapes(B, 80, seed=0), spec).to_jax()
    keys = tuple(collate_shapes(make_shapes(B, 80, seed=7 + i), spec).to_jax()
                 for i in range(K))
    model = cls(out_channels=5, conv1_kernel_size=3, k_neighbors=K,
                d_model=d_model, n_head=n_head)
    variables = jax.jit(lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), qb, keys)
    return model, variables, qb, keys


def test_cache_features_shapes_and_masking():
    model, variables, qb, keys = _setup(K=1)
    feats, pool = jax.jit(lambda v, b: model.apply(
        v, b, method="cache_features"))(variables, keys[0])
    B, L0 = np.asarray(keys[0].masks[0]).shape
    assert feats.shape == (B, L0, 32)
    assert pool.shape == (B, 32)
    assert pool.dtype == jnp.float32
    # padded voxel rows of the cached features are zero (masked _features)
    m = np.asarray(keys[0].masks[0])
    assert np.all(np.asarray(feats)[~m] == 0)


def test_csa_from_cache_matches_recompute():
    model, variables, qb, keys = _setup(K=2)

    ref = jax.jit(lambda v, b, ks: model.apply(v, b, ks, train=False))(
        variables, qb, keys)

    cache = [jax.jit(lambda v, b: model.apply(v, b, method="cache_features"))(
        variables, kb) for kb in keys]
    # [B, K, L0, d] / [B, K, d] / [B, K, L0] per-query rows
    key_feats = jnp.stack([c[0] for c in cache], axis=1)
    key_pools = jnp.stack([c[1] for c in cache], axis=1)
    key_masks = jnp.stack([kb.masks[0] for kb in keys], axis=1)

    out = jax.jit(lambda v, b, f, p, m: model.apply(
        v, b, f, p, m, method="csa_from_cache"))(
        variables, qb, key_feats, key_pools, key_masks)

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_csa_from_cache_k1_matches_recompute():
    model, variables, qb, keys = _setup(K=1, n_head=2)
    ref = jax.jit(lambda v, b, ks: model.apply(v, b, ks, train=False))(
        variables, qb, keys)
    feats, pool = jax.jit(lambda v, b: model.apply(
        v, b, method="cache_features"))(variables, keys[0])
    out = jax.jit(lambda v, b, f, p, m: model.apply(
        v, b, f, p, m, method="csa_from_cache"))(
        variables, qb, feats[:, None], pool[:, None],
        keys[0].masks[0][:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_exchange_rows_matches_direct_indexing():
    """ICI distributed gather (`parallel/collection.py`): sharded collection
    + masked-gather-psum row fetch must equal host fancy indexing exactly
    (every row owned by exactly one chip; zeros elsewhere)."""
    from jax.sharding import PartitionSpec as P
    from csn_tpu.parallel.collection import exchange_rows, shard_collection
    from csn_tpu.parallel.dp import make_mesh

    rng = np.random.default_rng(0)
    N, L0, d, B, K = 21, 6, 4, 3, 2
    feats = rng.normal(size=(N, L0, d)).astype(np.float16)
    pools = rng.normal(size=(N, d)).astype(np.float32)
    masks = rng.random((N, L0)) > 0.3
    mesh = make_mesh(8)
    cf, cp, cm, per = shard_collection(feats, pools, masks, mesh)
    assert per == 3  # 21 rows over 8 chips -> padded to 24
    idx = rng.integers(0, N, size=(8, B, K)).astype(np.int32)

    fn = jax.jit(jax.shard_map(
        lambda a, b, c, i: tuple(
            x[None] for x in exchange_rows(a, b, c, i, "data", per)),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=P("data"), check_vma=False))
    f, p, m = fn(cf, cp, cm, jnp.asarray(idx))
    # every chip gets its own [B, K] block of rows, exactly
    np.testing.assert_array_equal(np.asarray(f), feats[idx])
    np.testing.assert_array_equal(np.asarray(p), pools[idx])
    np.testing.assert_array_equal(np.asarray(m), masks[idx])


def test_trainer_dp_cached_eval_matches_recompute(tmp_path):
    """`--cached_eval --data_parallel 8`: the mesh-sharded collection cache
    + ICI neighbor exchange must reproduce the DP recompute eval (f16 cache
    quantization is the only divergence)."""
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    root = tmp_path / "partnet"
    write_synthetic_partnet(str(root), category="Display", n_train=8,
                            n_val=8, n_test=2, num_points=48)
    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=str(root),
        partnet_category="Display", batch_size=1, val_batch_size=1,
        test_batch_size=1, data_parallel=8, conv1_kernel_size=3, d_model=16,
        n_head=2, k_neighbors=1, max_epoch=1, num_points=48,
        level_shrink=1.5, avg_feat=True, log_dir=str(tmp_path / "logs"),
        seed=0).normalized()
    trainer = build_trainer(cfg, phases=("train", "val"))
    trainer.initialize()
    nbrs = [(i, [(i + 3) % 8]) for i in range(8)]
    trainer.val_dataset.neighbors = list(nbrs)

    ref = trainer.test_on(trainer.val_dataset)
    trainer.config.cached_eval = True
    out = trainer.test_on(trainer.val_dataset)
    assert trainer._collection_cache_dev is not None
    cf = trainer._collection_cache_dev[0]
    assert cf.dtype == jnp.float16
    # genuinely sharded, not replicated
    assert not cf.sharding.is_fully_replicated

    np.testing.assert_allclose(out[0], ref[0], rtol=0, atol=2e-3)  # loss
    np.testing.assert_allclose(out[1], ref[1], rtol=0, atol=5e-3)  # prec@1
    np.testing.assert_allclose(out[2], ref[2], rtol=0, atol=0.5)   # part IoU
    np.testing.assert_allclose(out[3], ref[3], rtol=0, atol=0.5)   # shape IoU


def test_trainer_cached_eval_matches_recompute(tmp_path):
    """`--cached_eval` test_on must reproduce the recompute eval (f16 cache
    quantization is the only divergence)."""
    from csn_tpu.config import Config
    from csn_tpu.data.partnet import write_synthetic_partnet
    from csn_tpu.tasks.main_csn import build_trainer

    root = tmp_path / "partnet"
    write_synthetic_partnet(str(root), category="Chair", n_train=6, n_val=4,
                            n_test=3, num_points=64)
    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=str(root),
        partnet_category="Chair", batch_size=2, val_batch_size=2,
        test_batch_size=2, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=2, max_epoch=1, num_points=64, level_shrink=1.5,
        log_dir=str(tmp_path / "logs"), seed=0).normalized()
    trainer = build_trainer(cfg, phases=("train", "val"))
    trainer.initialize()
    trainer.construct_shape_graph(recalculate=False)

    ref = trainer.test_on(trainer.val_dataset)
    trainer.config.cached_eval = True
    out = trainer.test_on(trainer.val_dataset)
    assert trainer._collection_cache is not None
    assert trainer._collection_cache[0].dtype == np.float16

    np.testing.assert_allclose(out[0], ref[0], rtol=0, atol=2e-3)  # loss
    np.testing.assert_allclose(out[1], ref[1], rtol=0, atol=5e-3)  # prec@1
    np.testing.assert_allclose(out[2], ref[2], rtol=0, atol=0.5)   # part IoU
    np.testing.assert_allclose(out[3], ref[3], rtol=0, atol=0.5)   # shape IoU
