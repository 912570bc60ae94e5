"""TPU-hardware windowed-interp tests (compiled Mosaic kernels).

CPU coverage (worklists + algorithm simulation) lives in
tests/test_interp_window.py; these run the real compiled kernels fwd +
custom-vjp bwd against the XLA gather/scatter reference. Skipped unless
RUN_TPU_TESTS=1."""

import os

import numpy as np
import pytest

RUN = os.environ.get("RUN_TPU_TESTS", "0") == "1"
pytestmark = pytest.mark.skipif(not RUN, reason="RUN_TPU_TESTS != 1")

if RUN:
    import jax

    if jax.devices()[0].platform == "cpu":
        pytestmark = pytest.mark.skip(reason="no TPU visible")


def _batch(B=2, n=3000, voxel=0.06):
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from tests.test_interp_window import make_shapes

    cls = load_model("HRNetSeg2S")
    spec = pyramid_spec_for_model(cls, num_points=n, voxel_size=voxel,
                                  conv1_kernel_size=3, shrink=1.5,
                                  use_windows=True)
    return collate_shapes(make_shapes(B, n), spec)


def test_interp_window_fwd_and_grad_match_xla_on_tpu():
    import jax
    import jax.numpy as jnp
    from csn_tpu.core.interp import interp_batch, interpolate_to_points

    vb = _batch()
    jb = vb.to_jax()
    assert "win!interp_f" in vb.kmaps
    B, L0 = vb.masks[0].shape
    C = 39
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(B, L0, C)).astype(np.float32))
    g = jnp.asarray(
        rng.normal(size=(B, vb.interp_idx.shape[1], C)).astype(np.float32))

    out = jax.jit(interp_batch)(flat, jb)
    ref = jax.jit(interpolate_to_points)(flat, jb.interp_idx, jb.interp_w,
                                         jb.point_to_voxel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_win(f):
        return jnp.vdot(interp_batch(f, jb), g)

    def loss_ref(f):
        return jnp.vdot(interpolate_to_points(
            f, jb.interp_idx, jb.interp_w, jb.point_to_voxel), g)

    gw = jax.jit(jax.grad(loss_win))(flat)
    gr = jax.jit(jax.grad(loss_ref))(flat)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)
