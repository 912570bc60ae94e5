"""Dense-grid stem conv (core/conv.py dense_stem_conv).

Exactness requirement: the dense 3D conv on per-shape [G, G, G] grids must
reproduce the kernel-map sparse conv bit-for-bit semantics (same offset
enumeration, zeros for absent neighbors) in forward AND weight gradient —
it replaces the stem path of ME's MinkowskiConvolution(kernel_size=5)
(`MinkowskiNet/models/hrnet.py:88-96`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.core.conv import _conv_impl, dense_stem_conv
from csn_tpu.core.pyramid import build_voxel_batch
from csn_tpu.data.pipeline import pyramid_spec_for_model, collate_shapes
from csn_tpu.models import load_model


def make_shapes(B=3, n=200, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    shapes = []
    for _ in range(B):
        coords = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
        feats = coords.copy()
        labels = rng.integers(0, 5, size=n).astype(np.int32)
        shapes.append((coords, feats, labels))
    return shapes


def _specs(ksize, voxel=0.2, B=3, n=200):
    cls = load_model("HRNetSeg2S")
    kw = dict(num_points=n, voxel_size=voxel, conv1_kernel_size=ksize,
              shrink=1.5)
    spec_d = pyramid_spec_for_model(cls, dense_stem_grid=None, **kw)  # auto
    spec_s = pyramid_spec_for_model(cls, **kw)          # default: off
    assert spec_d.dense_stem_grid > 0
    return spec_d, spec_s


@pytest.mark.parametrize("ksize", [3, 5])
def test_dense_stem_matches_gather_conv(ksize):
    spec_d, _ = _specs(ksize)
    shapes = make_shapes()
    vb = build_voxel_batch(shapes, spec_d)
    assert vb.stem_cells is not None
    jb = vb.to_jax()
    B, L0 = vb.masks[0].shape
    cin, cout = 3, 8
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(ksize ** 3, cin, cout))
                    .astype(np.float32))
    x = jnp.asarray(vb.vox_feats.astype(np.float32))

    ref = _conv_impl(x.reshape(B * L0, cin),
                     jnp.asarray(vb.kmaps[f"same0k{ksize}"]),
                     w).reshape(B, L0, cout)
    out = jax.jit(dense_stem_conv, static_argnums=(3, 4))(
        x, jb.stem_cells, w, jb.stem_grid, ksize)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dense_stem_weight_grad_matches():
    ksize = 3
    spec_d, _ = _specs(ksize)
    vb = build_voxel_batch(make_shapes(), spec_d)
    jb = vb.to_jax()
    B, L0 = vb.masks[0].shape
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(ksize ** 3, 3, 8)).astype(np.float32))
    x = jnp.asarray(vb.vox_feats.astype(np.float32))
    g_out = jnp.asarray(rng.normal(size=(B, L0, 8)).astype(np.float32))

    def loss_dense(w):
        o = dense_stem_conv(x, jb.stem_cells, w, jb.stem_grid, ksize,
                            input_grad=False)
        return jnp.vdot(o, g_out)

    def loss_ref(w):
        o = _conv_impl(x.reshape(B * L0, 3),
                       jnp.asarray(vb.kmaps[f"same0k{ksize}"]), w)
        return jnp.vdot(o.reshape(B, L0, 8), g_out)

    gd = jax.jit(jax.grad(loss_dense))(w)
    gr = jax.jit(jax.grad(loss_ref))(w)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_model_forward_same_with_and_without_dense_stem():
    """HRNetSeg2S end-to-end: same params, dense-stem batch vs sparse-only
    batch — identical outputs (the layer gate picks the path from the
    batch)."""
    cls = load_model("HRNetSeg2S")
    spec_d, spec_s = _specs(5)
    shapes = make_shapes()
    jb_d = collate_shapes(shapes, spec_d).to_jax()
    jb_s = collate_shapes(shapes, spec_s).to_jax()
    assert jb_d.stem_cells is not None and jb_s.stem_cells is None
    model = cls(out_channels=5, conv1_kernel_size=5)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), jb_s)
    out_s = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, jb_s)
    out_d = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, jb_d)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)


def test_extent_overflow_falls_back(caplog):
    """A batch wider than G gets stem_cells=None (sparse path, logged)."""
    cls = load_model("HRNetSeg2S")
    spec = pyramid_spec_for_model(cls, num_points=100, voxel_size=0.2,
                                  conv1_kernel_size=3, shrink=1.5,
                                  dense_stem_grid=4)
    vb = build_voxel_batch(make_shapes(B=2, n=100, spread=1.0), spec)
    assert vb.stem_cells is None and vb.stem_grid == 0


def test_concat_preserves_stem_cells():
    from csn_tpu.core.pyramid import concat_jax_batches

    spec_d, _ = _specs(3)
    jb1 = collate_shapes(make_shapes(seed=0), spec_d).to_jax()
    jb2 = collate_shapes(make_shapes(seed=1), spec_d).to_jax()
    cat = concat_jax_batches([jb1, jb2])
    assert cat.stem_cells is not None
    assert cat.stem_cells.shape[0] == 6
    np.testing.assert_array_equal(np.asarray(cat.stem_cells[:3]),
                                  np.asarray(jb1.stem_cells))
