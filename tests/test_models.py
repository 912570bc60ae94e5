"""Model zoo smoke + semantics tests (forward shapes, masking invariants,
SSA/CSA paths, gradient flow)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.data.pipeline import pyramid_spec_for_model, collate_shapes
from csn_tpu.models import load_model, MODELS


def make_shapes(B=2, n=80, seed=0):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        coords = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        feats = coords.copy()
        labels = rng.integers(0, 5, size=n).astype(np.int32)
        shapes.append((coords, feats, labels))
    return shapes


def build_jax_batch(model_cls, B=2, n=80, seed=0, voxel=0.2):
    spec = pyramid_spec_for_model(model_cls, num_points=n, voxel_size=voxel,
                                  conv1_kernel_size=3, shrink=1.5)
    vb = collate_shapes(make_shapes(B, n, seed), spec)
    return vb, vb.to_jax(), spec


def test_registry_has_reference_model_names():
    for name in ["HRNetSeg2S", "HRNetSeg3S", "HRNetSeg4S", "HRNetSimCSN2S",
                 "HRNetSimCSN3S", "HRNetSimCSN4S", "ResUNet14", "ResUNet18",
                 "ResUNet34", "ResUNet50", "ResUNet101", "Res16UNet14",
                 "Res16UNet18", "Res16UNet34", "Res16UNet50", "Res16UNet101",
                 "Res16UNet34C", "ResNet14", "ResNet18", "ResNet34",
                 "ResNet50", "ResNet101"]:
        assert name in MODELS, name


@pytest.mark.parametrize("name", ["HRNetSeg3S", "Res16UNet34C", "ResUNet14",
                                  "ResNet14"])
def test_forward_shapes_and_masking(name):
    cls = load_model(name)
    vb, jb, spec = build_jax_batch(cls)
    model = cls(out_channels=5, conv1_kernel_size=3)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), jb)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, jb)
    out_level = 0 if name != "ResNet14" else 5
    B, L = vb.masks[out_level].shape
    assert out.shape == (B, L, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_hrnet_csn_ssa_and_csa_paths():
    cls = load_model("HRNetSimCSN3S")
    vb, jb, spec = build_jax_batch(cls)
    kb1 = collate_shapes(make_shapes(2, 80, seed=7), spec).to_jax()
    kb2 = collate_shapes(make_shapes(2, 80, seed=8), spec).to_jax()
    model = cls(out_channels=5, conv1_kernel_size=3, k_neighbors=2,
                d_model=32, n_head=4)
    variables = jax.jit(lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), jb, (kb1, kb2))

    ssa = jax.jit(lambda v, b: model.apply(v, b, train=False,
                                           return_ssa=True))(variables, jb)
    B, L = vb.masks[0].shape
    assert ssa.shape == (B, L, 32)
    # padded voxel rows are masked to zero
    n0 = int(vb.num_voxels[0][0])
    assert np.all(np.asarray(ssa)[0, n0:] == 0)

    out = jax.jit(lambda v, b, ks: model.apply(v, b, ks, train=False))(
        variables, jb, (kb1, kb2))
    assert out.shape == (B, L, 5)
    assert np.isfinite(np.asarray(out)).all()

    # K=0 call with same params also works (SSA-only output path)
    out0 = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, jb)
    assert out0.shape == (B, L, 5)


def test_csa_compatibility_sums_to_one_effect():
    # With identical query/key batches, compatibility softmax is uniform-ish;
    # just check invariance: scaling output exists and differs from SSA-only.
    cls = load_model("HRNetSimCSN3S")
    vb, jb, spec = build_jax_batch(cls)
    kb = collate_shapes(make_shapes(2, 80, seed=9), spec).to_jax()
    model = cls(out_channels=4, conv1_kernel_size=3, k_neighbors=1,
                d_model=32, n_head=2)
    variables = jax.jit(lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(1), jb, (kb,))
    out_csa = jax.jit(lambda v, b, ks: model.apply(v, b, ks, train=False))(
        variables, jb, (kb,))
    out_ssa = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, jb)
    assert not np.allclose(np.asarray(out_csa), np.asarray(out_ssa))


def test_train_mode_updates_batch_stats_and_grads_flow():
    cls = load_model("HRNetSeg3S")
    vb, jb, spec = build_jax_batch(cls)
    model = cls(out_channels=5, conv1_kernel_size=3)
    variables = jax.jit(lambda r, b: model.init(r, b, train=True),
                        )(jax.random.PRNGKey(0), jb)
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(p):
        out, new_stats = model.apply(
            {"params": p, "batch_stats": stats}, jb, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2), new_stats

    (loss, new_stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves)
    # batch stats changed
    old = jax.tree_util.tree_leaves(stats)
    new = jax.tree_util.tree_leaves(new_stats["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_csa_with_self_key_equals_ssa_only():
    """With the single key being the query batch itself, compatibility is
    [0.5, 0.5] and cross-attention == self-attention, so the CSA output must
    equal the K=0 SSA output exactly (eval mode). End-to-end check of the
    combined (K+1)*B backbone pass: batch concat remaps, shared BN stats,
    batched cross-MHA."""
    cls = load_model("HRNetSimCSN2S")
    vb, jb, spec = build_jax_batch(cls)
    model = cls(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
                k_neighbors=1)
    variables = jax.jit(lambda r, b, k: model.init(r, b, k, train=False))(
        jax.random.PRNGKey(0), jb, (jb,))
    out_csa = jax.jit(lambda v, b, k: model.apply(v, b, k, train=False))(
        variables, jb, (jb,))
    out_ssa = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, jb)
    np.testing.assert_allclose(np.asarray(out_csa), np.asarray(out_ssa),
                               rtol=2e-4, atol=2e-5)


def test_bfloat16_compute_dtype_forward_and_grads():
    """Opt-in mixed precision (Config.compute_dtype='bfloat16'): activations
    run in bf16 but logits come back f32 and gradients stay finite; the
    f32 path's output must agree to bf16 tolerance."""
    import jax.numpy as jnp

    cls = load_model("HRNetSimCSN2S")
    vb, jb, spec = build_jax_batch(cls)
    kw = dict(out_channels=5, conv1_kernel_size=3, d_model=16, n_head=2,
              k_neighbors=1)
    m16 = cls(compute_dtype="bfloat16", **kw)
    m32 = cls(compute_dtype="float32", **kw)
    variables = jax.jit(lambda r, b, k: m32.init(r, b, k, train=False))(
        jax.random.PRNGKey(0), jb, (jb,))
    o16 = jax.jit(lambda v, b, k: m16.apply(v, b, k, train=False))(
        variables, jb, (jb,))
    o32 = jax.jit(lambda v, b, k: m32.apply(v, b, k, train=False))(
        variables, jb, (jb,))
    assert o16.dtype == jnp.float32
    scale = max(float(np.abs(np.asarray(o32)).max()), 1.0)
    assert float(np.abs(np.asarray(o16 - o32)).max()) < 0.05 * scale

    def loss_fn(p):
        out, nv = m16.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            jb, (jb,), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return (out ** 2).mean(), nv

    (loss, _), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert all(np.asarray(g).dtype == np.float32 for g in leaves)
