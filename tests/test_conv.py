"""Sparse conv / pooling / norm vs dense brute-force references."""

import numpy as np
import jax
import jax.numpy as jnp

from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, build_voxel_batch
from csn_tpu.core.conv import sparse_conv
from csn_tpu.models.layers import (
    MaskedBatchNorm, MaskedInstanceNorm, sum_pool, global_avg_pool,
    global_max_pool,
)


def build(maps, n=200, B=2, seed=0, cap=256):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        coords = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        labels = np.zeros(n, dtype=np.int32)
        shapes.append((coords, feats, labels))
    nl = 1 + max([m.level + (0 if m.kind == "same" else 1) for m in maps] + [0])
    spec = PyramidSpec(
        voxel_size=1.0, num_points=n, level_caps=tuple([cap] * nl),
        maps=tuple(maps), qmode=QMode.UNWEIGHTED_AVERAGE,
    )
    return shapes, spec, build_voxel_batch(shapes, spec, rng=rng)


def dense_reference_conv(vb, b, level, offs, w):
    """Brute-force: out[i] = sum_k W[k] @ feat[nbr(i,k)]."""
    n = int(vb.num_voxels[level][b])
    feats = vb.vox_feats[b]
    coord_to_idx = {tuple(vb.coords[level][b, i]): i for i in range(n)}
    cout = w.shape[-1]
    out = np.zeros((n, cout), dtype=np.float64)
    for i in range(n):
        for k, off in enumerate(offs):
            nbr = tuple(vb.coords[level][b, i] + off)
            j = coord_to_idx.get(nbr)
            if j is not None:
                out[i] += feats[j] @ w[k]
    return out


def test_sparse_conv_matches_dense():
    m = MapSpec("same", 0, 3)
    shapes, spec, vb = build([m], n=150)
    B, L = vb.masks[0].shape
    rng = np.random.default_rng(1)
    w = rng.normal(size=(27, 4, 6)).astype(np.float32) * 0.1

    out = sparse_conv(
        jnp.asarray(vb.vox_feats.reshape(B * L, 4)),
        jnp.asarray(vb.kmaps[m.name]),
        jnp.asarray(w),
    )
    out = np.asarray(out).reshape(B, L, 6)
    for b in range(B):
        ref = dense_reference_conv(vb, b, 0, m.offsets(), w)
        np.testing.assert_allclose(out[b, : ref.shape[0]], ref, rtol=1e-4,
                                   atol=1e-4)


def test_strided_conv_matches_dense():
    m = MapSpec("down", 0, 2)
    shapes, spec, vb = build([m], n=150)
    B, L0 = vb.masks[0].shape
    _, L1 = vb.masks[1].shape
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 4, 5)).astype(np.float32) * 0.1
    out = np.asarray(
        sparse_conv(
            jnp.asarray(vb.vox_feats.reshape(B * L0, 4)),
            jnp.asarray(vb.kmaps[m.name]),
            jnp.asarray(w),
        )
    ).reshape(B, L1, 5)
    offs = m.offsets()
    for b in range(B):
        n1 = int(vb.num_voxels[1][b])
        n0 = int(vb.num_voxels[0][b])
        coord_to_idx = {tuple(vb.coords[0][b, i]): i for i in range(n0)}
        for i in range(n1):
            acc = np.zeros(5)
            for k, off in enumerate(offs):
                j = coord_to_idx.get(tuple(vb.coords[1][b, i] + off))
                if j is not None:
                    acc += vb.vox_feats[b, j] @ w[k]
            np.testing.assert_allclose(out[b, i], acc, rtol=1e-4, atol=1e-4)


def test_sum_pool_matches_manual():
    m = MapSpec("down", 0, 2)
    shapes, spec, vb = build([m], n=150)
    jb = vb.to_jax()
    B, L0 = vb.masks[0].shape
    _, L1 = vb.masks[1].shape
    x = jnp.asarray(vb.vox_feats)
    out = np.asarray(sum_pool(jb, x, m.name, (B, L1)))
    offs = m.offsets()
    b = 0
    n1 = int(vb.num_voxels[1][b])
    n0 = int(vb.num_voxels[0][b])
    coord_to_idx = {tuple(vb.coords[0][b, i]): i for i in range(n0)}
    for i in range(0, n1, 7):
        acc = np.zeros(4)
        for off in offs:
            j = coord_to_idx.get(tuple(vb.coords[1][b, i] + off))
            if j is not None:
                acc += vb.vox_feats[b, j]
        np.testing.assert_allclose(out[b, i], acc, rtol=1e-5, atol=1e-5)


def test_sum_pool_decodes_compact_wire():
    """sum_pool must decode the int16-delta compact wire exactly like
    SparseConv does. The raw table holds per-256-row-tile deltas, so using
    it as absolute indices is only coincidentally right for rows < 256
    (tile base 0) — batch 1's rows sit past the first tile and gathered
    garbage before the decode_kmap fix. Compact and full wires must agree
    bit-for-bit on every batch."""
    m = MapSpec("down", 0, 2)
    shapes, spec, vb = build([m], n=150)
    B, L1 = vb.masks[1].shape
    _, L0 = vb.masks[0].shape
    assert B * L1 > 256, "geometry must cross the first wire tile"
    x = jnp.asarray(vb.vox_feats)
    out_full = np.asarray(
        sum_pool(vb.to_jax(compact=False), x, m.name, (B, L1)))
    out_compact = np.asarray(
        sum_pool(vb.to_jax(compact=True), x, m.name, (B, L1)))
    np.testing.assert_array_equal(out_compact, out_full)
    # batch 1 (rows >= 256, nonzero tile base) must carry real signal
    n1 = int(vb.num_voxels[1][1])
    assert np.abs(out_full[1, :n1]).sum() > 0


def test_tvjp_backward_matches_autodiff():
    """The all-gather backward (transpose kernel maps) must produce the same
    gradients as plain autodiff through the gather-scatter formulation."""
    import jax

    maps = [MapSpec("same", 0, 3), MapSpec("down", 0, 2), MapSpec("up", 0, 2)]
    shapes, spec, vb = build(maps, n=120, B=2)
    B, L0 = vb.masks[0].shape
    _, L1 = vb.masks[1].shape
    rng = np.random.default_rng(5)
    feats = jnp.asarray(vb.vox_feats.reshape(B * L0, 4))

    cases = [
        ("same0k3", "same0k3", True, L0),
        ("down0k2", "up0k2", False, L1),
        ("up0k2", "down0k2", False, L0),
    ]
    for name, t_name, mirror, l_out in cases:
        kmap = jnp.asarray(vb.kmaps[name])
        kmap_t = jnp.asarray(vb.kmaps[t_name])
        K = kmap.shape[0]
        w = jnp.asarray(
            rng.normal(size=(K, 4, 5)).astype(np.float32) * 0.2)
        src = feats if name != "up0k2" else jnp.asarray(
            np.pad(rng.normal(size=(B * L1, 4)).astype(np.float32), ((0, 0),
                                                                     (0, 0))))

        def loss_plain(f, ww):
            return jnp.sum(sparse_conv(f, kmap, ww) ** 2)

        def loss_tvjp(f, ww):
            return jnp.sum(sparse_conv(f, kmap, ww, kmap_t=kmap_t,
                                       mirror=mirror) ** 2)

        gf1, gw1 = jax.grad(loss_plain, argnums=(0, 1))(src, w)
        gf2, gw2 = jax.grad(loss_tvjp, argnums=(0, 1))(src, w)
        np.testing.assert_allclose(np.asarray(gf2), np.asarray(gf1),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
        np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_masked_batchnorm_train_stats():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 3)).astype(np.float32) * 2 + 1
    mask = np.zeros((2, 16), dtype=bool)
    mask[0, :10] = True
    mask[1, :5] = True
    bn = MaskedBatchNorm(momentum=0.1)
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask),
                    True)
    y, new_state = bn.apply(vars_, jnp.asarray(x), jnp.asarray(mask), True,
                            mutable=["batch_stats"])
    valid = np.concatenate([x[0, :10], x[1, :5]], axis=0)
    mean = valid.mean(axis=0)
    var = valid.var(axis=0)
    ynp = np.asarray(y)
    got_valid = np.concatenate([ynp[0, :10], ynp[1, :5]], axis=0)
    np.testing.assert_allclose(got_valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(got_valid.var(axis=0), 1.0, atol=1e-2)
    # padded rows zero
    assert np.all(ynp[0, 10:] == 0)
    # running stats moved toward batch stats (torch momentum semantics)
    rm = np.asarray(new_state["batch_stats"]["MaskedBatchNorm_0"]["mean"]
                    if "MaskedBatchNorm_0" in new_state["batch_stats"]
                    else new_state["batch_stats"]["mean"])
    np.testing.assert_allclose(rm, 0.1 * mean, rtol=1e-4, atol=1e-4)


def test_instance_norm_per_shape():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 3)).astype(np.float32) * 3 + 2
    mask = np.ones((2, 12), dtype=bool)
    mask[1, 6:] = False
    inorm = MaskedInstanceNorm()
    vars_ = inorm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    y = np.asarray(inorm.apply(vars_, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(y[0].mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y[1, :6].mean(axis=0), 0.0, atol=1e-4)
    assert np.all(y[1, 6:] == 0)


def test_global_pools():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 8, 3))
    mask = jnp.asarray(np.array([[True] * 4 + [False] * 4]))
    avg = np.asarray(global_avg_pool(x, mask))[0]
    mx = np.asarray(global_max_pool(x, mask))[0]
    np.testing.assert_allclose(avg, np.arange(24).reshape(8, 3)[:4].mean(0))
    np.testing.assert_allclose(mx, np.arange(24).reshape(8, 3)[:4].max(0))
