"""Pin the ME kernel-offset enumeration (PARITY, VERDICT r2 #3).

`models/convert.py` loads the reference's released checkpoints by permuting
ME's kernel rows (`offset_order='xyz'`) into our z-fastest order. These tests
make that one documented bit deterministic: a numpy forward implementing ME
0.5.4's kernel-region semantics (`csn_tpu/models/me_reference.py`, x-fastest
rows per `MinkowskiEngine/src/kernel_region.hpp RegionIterator`) must match
our pyramid/kmap/sparse_conv pipeline exactly when the kernel is converted
with the default permutation — for same-level k3/k5, strided down k3, and
transposed up k3 convs, on geometry with negative coordinates.
"""

import numpy as np
import jax.numpy as jnp

from csn_tpu.core.conv import sparse_conv
from csn_tpu.core.pyramid import (
    MapSpec, PyramidSpec, QMode, build_voxel_batch,
)
from csn_tpu.models.convert import _kernel_perm
from csn_tpu.models.me_reference import me_offsets, me_sparse_conv


def _batch(n=700, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * rng.uniform(0.5, 1.0, size=(n, 1))).astype(np.float32)
    spec = PyramidSpec(voxel_size=0.12, num_points=n, level_caps=(640, 320),
                       maps=(MapSpec("same", 0, 3), MapSpec("same", 0, 5),
                             MapSpec("down", 0, 3), MapSpec("up", 0, 3)),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch(
        [(pts, rng.normal(size=(n, 4)).astype(np.float32),
          np.zeros(n, np.int32))], spec, use_native=False)
    assert vb.dropped == [0, 0]
    return vb, rng


def test_me_offset_rows_are_x_fastest():
    offs = me_offsets(3, 1)
    # row 0 = (-1,-1,-1), row 1 bumps x, row 3 bumps y, row 9 bumps z
    np.testing.assert_array_equal(offs[0], [-1, -1, -1])
    np.testing.assert_array_equal(offs[1], [0, -1, -1])
    np.testing.assert_array_equal(offs[3], [-1, 0, -1])
    np.testing.assert_array_equal(offs[9], [-1, -1, 0])
    # converter permutation: me_row k holds OUR offset perm[k]
    ours = MapSpec("same", 0, 3).offsets()
    perm = _kernel_perm(3, "xyz")
    for k in range(27):
        np.testing.assert_array_equal(offs[k], ours[perm[k]])


def _ours(vb, name, feats, n_out, kernel_me, ksize):
    """Run our gather conv with an ME-ordered kernel via the converter
    permutation."""
    kmap = jnp.asarray(vb.kmaps[name])
    ours_kernel = jnp.asarray(kernel_me[_kernel_perm(ksize, "xyz")])
    out = sparse_conv(jnp.asarray(feats), kmap, ours_kernel)
    return np.asarray(out)[:n_out]


def test_same_level_convs_match_me_reference():
    vb, rng = _batch()
    n0 = int(vb.num_voxels[0][0])
    coords = vb.coords[0][0, :n0].astype(np.int64)
    assert (coords < 0).any(), "geometry must include negative coords"
    cin, cout = 4, 6
    feats = np.zeros((640, cin), np.float32)
    feats[:n0] = rng.normal(size=(n0, cin)).astype(np.float32)

    for ksize, name in ((3, "same0k3"), (5, "same0k5")):
        km = rng.normal(size=(ksize ** 3, cin, cout)).astype(np.float32)
        ref = me_sparse_conv(coords, feats[:n0], coords, km, ksize, 1)
        got = _ours(vb, name, feats, n0, km, ksize)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_strided_down_conv_matches_me_reference():
    vb, rng = _batch(seed=1)
    n0 = int(vb.num_voxels[0][0])
    n1 = int(vb.num_voxels[1][0])
    c0 = vb.coords[0][0, :n0].astype(np.int64)
    c1 = vb.coords[1][0, :n1].astype(np.int64)
    cin, cout = 4, 6
    feats = np.zeros((640, cin), np.float32)
    feats[:n0] = rng.normal(size=(n0, cin)).astype(np.float32)
    km = rng.normal(size=(27, cin, cout)).astype(np.float32)
    # region on the input (stride-1) grid; out coords on the stride-2 grid
    ref = me_sparse_conv(c0, feats[:n0], c1, km, 3, 1)
    got = _ours(vb, "down0k3", feats, n1, km, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_transpose_up_conv_matches_me_reference():
    vb, rng = _batch(seed=2)
    n0 = int(vb.num_voxels[0][0])
    n1 = int(vb.num_voxels[1][0])
    c0 = vb.coords[0][0, :n0].astype(np.int64)
    c1 = vb.coords[1][0, :n1].astype(np.int64)
    cin, cout = 4, 6
    feats = np.zeros((320, cin), np.float32)
    feats[:n1] = rng.normal(size=(n1, cin)).astype(np.float32)
    km = rng.normal(size=(27, cin, cout)).astype(np.float32)
    # adjoint pairing: output (fine) c' reads input c' - o with row idx(o)
    ref = me_sparse_conv(c1, feats[:n1], c0, km, 3, 1, transpose=True)
    got = _ours(vb, "up0k3", feats, n0, km, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
