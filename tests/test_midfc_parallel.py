"""MID-FC data x sequence parallelism (parallel/midfc.py) on the virtual
8-device CPU mesh: exact parity of eval logits, SSA features, loss, and
gradients vs the single-device step (dropout=0 so the only nondeterminism —
per-chip mask streams — is off), plus the runner/CLI product path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.midfc.model import CrossShapeAt, get_model
from csn_tpu.parallel.midfc import make_midfc_mesh, make_midfc_steps
from csn_tpu.train.losses import cross_entropy_positive_labels

B, P, C, NCLS, K = 4, 40, 16, 5, 2
CHUNK = 10


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, P, C)).astype(np.float32)
    # labels 0 (masked) .. NCLS-1, uneven across shards on purpose
    labels = rng.integers(0, NCLS, size=(B, P)).astype(np.int32)
    labels[0, : P // 2] = 0  # one shard of shape 0 contributes nothing
    neighbors = rng.normal(size=(B, K + 1, P, C)).astype(np.float32)
    neighbors[:, 0] = feats
    return feats, labels, neighbors


def build(attention_type):
    model = get_model(attention_type, NCLS, n_heads=2, K=K, chunk_size=CHUNK,
                      d_model=C, dropout=0.0)
    feats, labels, neighbors = make_inputs()
    if attention_type == "csa":
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               jnp.asarray(neighbors), train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               train=False)
    return model, variables["params"], feats, labels, neighbors


def single_device_grad(model, params, feats, labels, neighbors, is_csa):
    def loss_fn(p):
        if is_csa:
            logits = model.apply({"params": p}, feats, neighbors, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(7)})
        else:
            logits = model.apply({"params": p}, feats, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(7)})
        return cross_entropy_positive_labels(logits, labels)

    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("attention_type,n_data,n_seq", [
    ("ssa", 4, 2), ("ssa", 1, 4), ("csa", 2, 2), ("csa", 4, 1),
    ("csa", 1, 4),
])
def test_parallel_matches_single_device(attention_type, n_data, n_seq):
    is_csa = attention_type == "csa"
    model, params, feats, labels, neighbors = build(attention_type)
    mesh = make_midfc_mesh(n_data, n_seq)
    steps = make_midfc_steps(model, attention_type, mesh)
    nb = jnp.asarray(neighbors) if is_csa else None

    # eval logits
    if is_csa:
        ref_logits = model.apply({"params": params}, feats, neighbors,
                                 train=False)
    else:
        ref_logits = model.apply({"params": params}, feats, train=False)
    got = steps.eval(params, jnp.asarray(feats), nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-5)

    # ssa features
    ref_ssa = model.apply({"params": params}, jnp.asarray(feats),
                          method=CrossShapeAt.get_ssa_feats)
    got_ssa = steps.ssa_feats(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got_ssa), np.asarray(ref_ssa),
                               rtol=2e-5, atol=2e-5)

    # loss + grads (dropout rate 0 -> rng stream does not matter)
    ref_loss, ref_grads = single_device_grad(
        model, params, jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(neighbors) if is_csa else None, is_csa)
    loss, grads = steps.grad(params, jnp.asarray(feats), jnp.asarray(labels),
                             nb, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_got = jax.tree_util.tree_leaves(grads)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-5)


def test_nan_loss_zeroes_grads_across_mesh():
    model, params, feats, labels, neighbors = build("csa")
    mesh = make_midfc_mesh(2, 2)
    steps = make_midfc_steps(model, "csa", mesh)
    bad = np.array(feats)
    bad[1, 3, :] = np.nan  # poison one shard only; psum propagates the NaN
    loss, grads = steps.grad(params, jnp.asarray(bad), jnp.asarray(labels),
                             jnp.asarray(neighbors), jax.random.PRNGKey(0))
    assert float(loss) == 0.0
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.asarray(g) == 0.0)


def test_shape_guards():
    model, params, feats, labels, neighbors = build("ssa")
    mesh = make_midfc_mesh(1, 8)  # local P = 5, not a CHUNK=10 multiple
    steps = make_midfc_steps(model, "ssa", mesh)
    with pytest.raises(ValueError, match="chunk"):
        steps.ssa_feats(params, jnp.asarray(feats))
    mesh = make_midfc_mesh(3, 1)  # B=4 not divisible by 3
    steps = make_midfc_steps(model, "ssa", mesh)
    with pytest.raises(ValueError, match="batch"):
        steps.ssa_feats(params, jnp.asarray(feats))
    # ring_axis + chunked attention is a contradiction (each local chunk
    # would ring to same-index chunks on other chips) — must fail fast
    from csn_tpu.midfc.model import ChunkedMHA

    bad = ChunkedMHA(n_head=2, d_model=C, d_k=C, d_v=C, chunk_size=CHUNK,
                     ring_axis="seq")
    x = jnp.zeros((1, P, C), jnp.float32)
    with pytest.raises(ValueError, match="ring_axis requires"):
        bad.init(jax.random.PRNGKey(0), x, x, x)


@pytest.mark.slow
def test_ring_attention_matches_dense():
    """ring_attention inside shard_map == dense softmax attention on the
    full key set (grads included), with a nontrivial K/V mask that travels
    the ring."""
    from jax.sharding import PartitionSpec as P

    from csn_tpu.ops.attention import (
        ring_attention, scaled_dot_product_attention,
    )

    b, h, l, dk, dv, n = 2, 3, 32, 8, 16, 4
    rng = np.random.default_rng(3)
    q = rng.normal(size=(b, h, l, dk)).astype(np.float32)
    k = rng.normal(size=(b, h, l, dk)).astype(np.float32)
    v = rng.normal(size=(b, h, l, dv)).astype(np.float32)
    mask = rng.random((b, l)) > 0.3
    mask[:, :2] = True  # keep at least one valid key per shard-ish

    mesh = make_midfc_mesh(1, n)

    def sharded(q, k, v, m):
        f = jax.shard_map(
            lambda a, b_, c, d: ring_attention(a, b_, c, d, axis="seq"),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                      P(None, None, "seq", None), P(None, "seq")),
            out_specs=P(None, None, "seq", None), check_vma=False)
        return f(q, k, v, m)

    ref = scaled_dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), jnp.asarray(mask))
    got = sharded(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                  jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # gradient parity through the ring (ppermute transpose)
    def loss_ring(q_):
        return (sharded(q_, jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(mask)) ** 2).sum()

    def loss_ref(q_):
        return (scaled_dot_product_attention(
            q_, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)) ** 2).sum()

    g_ring = jax.grad(loss_ring)(jnp.asarray(q))
    g_ref = jax.grad(loss_ref)(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               rtol=5e-5, atol=5e-6)


def test_ring_attention_dropout_unbiased():
    """Ring dropout uses the flash rescaling identity (numerator masked and
    /keep, denominator UNdropped), so the dropped output is an unbiased
    estimator of the undropped one: the mean over seeds must converge to
    the dropout=0 output. Also: same rng => deterministic output."""
    from jax.sharding import PartitionSpec as P

    from csn_tpu.ops.attention import ring_attention

    b, h, l, dk, dv, n = 1, 2, 16, 8, 8, 4
    rate = 0.3
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(b, h, l, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, dv)).astype(np.float32))

    mesh = make_midfc_mesh(1, n)

    def run(key):
        f = jax.shard_map(
            lambda a, b_, c, kk: ring_attention(
                a, b_, c, None, axis="seq", dropout_rate=rate,
                dropout_rng=kk[0]),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                      P(None, None, "seq", None), P()),
            out_specs=P(None, None, "seq", None), check_vma=False)
        return f(q, k, v, key[None])

    base = jax.shard_map(
        lambda a, b_, c: ring_attention(a, b_, c, None, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)(q, k, v)

    # determinism: one rng, two calls
    k0 = jax.random.PRNGKey(123)
    np.testing.assert_array_equal(np.asarray(run(k0)), np.asarray(run(k0)))

    runj = jax.jit(run)
    n_seeds = 400
    acc = np.zeros(base.shape, np.float64)
    for s in range(n_seeds):
        acc += np.asarray(runj(jax.random.PRNGKey(s)), np.float64)
    mean = acc / n_seeds
    # SE of the mean ~ rate/sqrt(n_seeds) of the attention scale; loose 3-sigma
    err = np.abs(mean - np.asarray(base, np.float64))
    tol = 3.0 * rate / np.sqrt(n_seeds) * np.abs(np.asarray(v)).max()
    assert err.max() < max(tol, 0.12), (err.max(), tol)


@pytest.mark.parametrize("attention_type,n_data,n_seq", [
    ("ssa", 1, 4), ("csa", 2, 2),
])
def test_full_attention_seq_parallel_rings(attention_type, n_data, n_seq):
    """chunk_size=None (full attention) under point sharding routes through
    ring_attention and still matches the single-device model exactly."""
    is_csa = attention_type == "csa"
    model = get_model(attention_type, NCLS, n_heads=2, K=K, chunk_size=None,
                      d_model=C, dropout=0.0)
    feats, labels, neighbors = make_inputs()
    if is_csa:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               jnp.asarray(neighbors), train=False)
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               train=False)
    params = variables["params"]
    mesh = make_midfc_mesh(n_data, n_seq)
    steps = make_midfc_steps(model, attention_type, mesh)
    nb = jnp.asarray(neighbors) if is_csa else None

    if is_csa:
        ref_logits = model.apply({"params": params}, feats, neighbors,
                                 train=False)
    else:
        ref_logits = model.apply({"params": params}, feats, train=False)
    got = steps.eval(params, jnp.asarray(feats), nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-5)

    ref_loss, ref_grads = single_device_grad(
        model, params, jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(neighbors) if is_csa else None, is_csa)
    loss, grads = steps.grad(params, jnp.asarray(feats), jnp.asarray(labels),
                             nb, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-5)


def test_runner_parallel_trains_and_rebuilds(tmp_path):
    """Product path: MidfcRunner with data_parallel x seq_parallel drives a
    real SSA train epoch + validation + knn-graph build on synthetic data,
    and the CSA two-phase trainer runs end-to-end (testing mode)."""
    from csn_tpu.midfc.data import (
        CSAFeaturesDataset, FeaturesDataset, write_synthetic_midfc,
    )
    from csn_tpu.midfc.training import (
        MidfcConfig, MidfcRunner, compute_knn_graphs, train_csa,
    )

    tr_root = write_synthetic_midfc(str(tmp_path / "train"), n_shapes=6,
                                    num_points=40, channels=C,
                                    num_classes=NCLS, seed=0)
    te_root = write_synthetic_midfc(str(tmp_path / "test"), n_shapes=4,
                                    num_points=40, channels=C,
                                    num_classes=NCLS, seed=1)
    cfg = MidfcConfig(
        logs_dir=str(tmp_path / "logs"), partname="Bed", num_classes=NCLS,
        n_heads=2, K=1, batch_size=4, d_model=C, chunk_size=10,
        num_points=40, epochs=1, gradient_accumulation_steps=2,
        use_flash=False, data_parallel=2, seq_parallel=2, testing=False)

    runner = MidfcRunner(cfg, "ssa")
    tr_ds = FeaturesDataset(tr_root, cfg.num_points)
    te_ds = FeaturesDataset(te_root, cfg.num_points)
    f0, _, _ = next(iter(tr_ds.batches(cfg.batch_size)))
    runner.initialize(f0)
    loss = runner.train_epoch(tr_ds, is_csa=False)
    assert np.isfinite(loss)
    iou, vloss = runner.validate(te_ds, is_csa=False)
    assert np.isfinite(iou) and np.isfinite(vloss)

    # knn graphs go through the sharded ssa-feature step
    tr_graph, te_graph = compute_knn_graphs(runner, tr_ds, te_ds, cfg.K,
                                            "Bed")
    assert tr_graph.shape == (len(tr_ds), cfg.K + 1)
    assert te_graph.shape == (len(te_ds), cfg.K + 1)

    # CSA two-phase trainer (testing=True: one batch per loop) on the mesh
    cfg_csa = MidfcConfig(**{**cfg.__dict__, "testing": True,
                             "logs_dir": str(tmp_path / "logs_csa")})
    best, ckpt = train_csa(cfg_csa, tr_root, te_root, tr_graph, te_graph)
    assert os.path.exists(ckpt)
    assert np.isfinite(best)
