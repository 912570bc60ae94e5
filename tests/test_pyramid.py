"""Unit tests for the static-shape voxel pyramid / kernel-map builder,
validated against brute-force dense references (SURVEY.md §4: the reference has
no tests; kernel-level dense-reference tests are our own pyramid base)."""

import numpy as np
import pytest

from csn_tpu.core.pyramid import (
    MapSpec, PyramidSpec, QMode, build_voxel_batch, default_level_caps,
)


def make_shape(rng, n=500, scale=10.0):
    coords = rng.uniform(-1, 1, size=(n, 3)) * scale
    feats = coords.copy().astype(np.float32)
    labels = rng.integers(0, 5, size=n).astype(np.int32)
    return coords.astype(np.float32), feats, labels


def build(spec_maps, n=500, B=2, voxel=1.0, qmode=QMode.RANDOM_SUBSAMPLE,
          caps=None, seed=0):
    rng = np.random.default_rng(seed)
    shapes = [make_shape(rng, n) for _ in range(B)]
    nl = 1 + max(
        [m.level + (1 if m.kind != "same" else 0) for m in spec_maps] + [0]
    )
    spec = PyramidSpec(
        voxel_size=voxel,
        num_points=n,
        level_caps=caps or default_level_caps(n, nl, shrink=1.0),
        maps=tuple(spec_maps),
        qmode=qmode,
    )
    return shapes, spec, build_voxel_batch(shapes, spec, rng=rng)


def test_quantization_unique_and_counts():
    shapes, spec, vb = build([], n=400)
    for b, (c, f, l) in enumerate(shapes):
        ic = np.floor(c / spec.voxel_size).astype(np.int64)
        expected = np.unique(ic, axis=0)
        n = int(vb.num_voxels[0][b])
        assert n == expected.shape[0]
        # voxels must be stored in lexicographic (x, y, z) order — the
        # sorted layout is what makes the windowed conv kernels possible
        rows = vb.coords[0][b, :n].astype(np.int64)
        order = np.lexsort((rows[:, 2], rows[:, 1], rows[:, 0]))
        np.testing.assert_array_equal(order, np.arange(n))
        # set equality of voxel coordinates
        got_set = {tuple(r) for r in vb.coords[0][b, :n]}
        exp_set = {tuple(r) for r in expected}
        assert got_set == exp_set


def test_average_quantization_features():
    shapes, spec, vb = build([], n=300, qmode=QMode.UNWEIGHTED_AVERAGE)
    b = 0
    c, f, _ = shapes[b]
    ic = np.floor(c / spec.voxel_size).astype(np.int64)
    n = int(vb.num_voxels[0][b])
    for i in range(0, n, 17):
        vox = vb.coords[0][b, i]
        sel = np.all(ic == vox[None, :], axis=1)
        np.testing.assert_allclose(
            vb.vox_feats[b, i], f[sel].mean(axis=0), rtol=1e-5, atol=1e-5
        )


def test_random_subsample_picks_member_point():
    shapes, spec, vb = build([], n=300, qmode=QMode.RANDOM_SUBSAMPLE)
    b = 0
    c, f, _ = shapes[b]
    ic = np.floor(c / spec.voxel_size).astype(np.int64)
    n = int(vb.num_voxels[0][b])
    for i in range(0, n, 13):
        vox = vb.coords[0][b, i]
        sel = np.all(ic == vox[None, :], axis=1)
        member_feats = f[sel]
        assert any(
            np.allclose(vb.vox_feats[b, i], mf) for mf in member_feats
        )


def test_same_level_kernel_map_brute_force():
    maps = [MapSpec("same", 0, 3)]
    shapes, spec, vb = build(maps, n=300, B=2)
    km = vb.kmaps["same0k3"]
    B, L = vb.masks[0].shape
    offs = maps[0].offsets()
    for b in range(B):
        n = int(vb.num_voxels[0][b])
        coord_to_idx = {
            tuple(vb.coords[0][b, i]): i for i in range(n)
        }
        for i in range(0, n, 29):
            for k in range(len(offs)):
                got = km[k, b * L + i]
                nbr = tuple(vb.coords[0][b, i] + offs[k])
                if nbr in coord_to_idx:
                    assert got == b * L + coord_to_idx[nbr]
                else:
                    assert got == B * L
    # padded outputs all sentinel
    for b in range(B):
        n = int(vb.num_voxels[0][b])
        assert np.all(km[:, b * L + n : (b + 1) * L] == B * L)


def test_down_and_up_maps_are_transposes():
    maps = [MapSpec("down", 0, 2), MapSpec("up", 0, 2)]
    shapes, spec, vb = build(maps, n=400, B=2)
    down = vb.kmaps["down0k2"]
    up = vb.kmaps["up0k2"]
    B, L0 = vb.masks[0].shape
    _, L1 = vb.masks[1].shape
    # Every (offset k, fine voxel j) pair in the down map corresponds to the
    # same pair in the up map: down[k, coarse] = fine  <=>  up[k, fine] = coarse
    pairs_down = set()
    for k in range(down.shape[0]):
        for out in range(B * L1):
            src = down[k, out]
            if src < B * L0:
                pairs_down.add((k, int(src), out))
    pairs_up = set()
    for k in range(up.shape[0]):
        for out in range(B * L0):
            src = up[k, out]
            if src < B * L1:
                pairs_up.add((k, out, int(src)))
    assert pairs_down == pairs_up
    assert len(pairs_down) > 0


def test_downsample_coords_are_floor_div():
    maps = [MapSpec("down", 0, 2)]
    shapes, spec, vb = build(maps, n=400, B=1)
    b = 0
    n0 = int(vb.num_voxels[0][b])
    n1 = int(vb.num_voxels[1][b])
    expected = np.unique(
        (np.floor_divide(vb.coords[0][b, :n0].astype(np.int64), 2)) * 2, axis=0
    )
    assert n1 == expected.shape[0]
    got_set = {tuple(r) for r in vb.coords[1][b, :n1]}
    assert got_set == {tuple(r) for r in expected}
    # level-1 coords are multiples of 2
    assert np.all(vb.coords[1][b, :n1] % 2 == 0)


def test_interp_weights_sum_to_one_when_all_corners_present():
    # Dense grid: every corner exists -> trilinear weights sum to 1.
    n = 6
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1)
    coords = g.reshape(-1, 3).astype(np.float32) + 0.3  # fractional offset
    feats = coords.copy()
    labels = np.zeros(len(coords), dtype=np.int32)
    spec = PyramidSpec(
        voxel_size=1.0, num_points=len(coords),
        level_caps=(len(coords) + 8,), maps=(),
    )
    vb = build_voxel_batch([(coords, feats, labels)], spec)
    p = int(vb.point_mask[0].sum())
    wsum = vb.interp_w[0, :p].sum(axis=1)
    interior = np.all((coords > 0.5) & (coords < n - 1.5), axis=1)
    np.testing.assert_allclose(wsum[interior], 1.0, atol=1e-5)


def test_interp_exact_at_voxel_corner():
    coords = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5.0, 5.0, 5.0]],
                      dtype=np.float32)
    feats = np.eye(3, dtype=np.float32)
    labels = np.zeros(3, dtype=np.int32)
    spec = PyramidSpec(voxel_size=1.0, num_points=3, level_caps=(8,), maps=())
    vb = build_voxel_batch([(coords, feats, labels)], spec)
    # point 0 sits exactly at voxel (0,0,0): weight 1 on that corner
    import jax.numpy as jnp
    from csn_tpu.core.interp import interpolate_to_points

    jb = vb.to_jax()
    vf = jnp.asarray(vb.vox_feats)
    out = interpolate_to_points(vf, jb.interp_idx, jb.interp_w,
                                jb.point_to_voxel)
    np.testing.assert_allclose(np.asarray(out[0, 0]), feats[0], atol=1e-5)


def test_native_engine_matches_numpy():
    from csn_tpu.core import native

    if not native.available():
        pytest.skip("native engine not built")
    maps = [MapSpec("same", 0, 3), MapSpec("down", 0, 2), MapSpec("up", 0, 2)]
    rng = np.random.default_rng(3)
    shapes = [make_shape(rng, 300) for _ in range(2)]
    spec = PyramidSpec(voxel_size=1.0, num_points=300,
                       level_caps=(320, 320), maps=tuple(maps),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb_np = build_voxel_batch(shapes, spec, rng=np.random.default_rng(7),
                              use_native=False)
    vb_nat = build_voxel_batch(shapes, spec, rng=np.random.default_rng(7),
                               use_native=True)

    for b in range(2):
        for l in range(2):
            n1 = int(vb_np.num_voxels[l][b])
            n2 = int(vb_nat.num_voxels[l][b])
            assert n1 == n2
            s1 = {tuple(r) for r in vb_np.coords[l][b, :n1]}
            s2 = {tuple(r) for r in vb_nat.coords[l][b, :n2]}
            assert s1 == s2

    # Functional equivalence: a conv over each batch produces identical
    # per-coordinate outputs (voxel ordering differs between the builders).
    import jax.numpy as jnp
    from csn_tpu.core.conv import sparse_conv
    from csn_tpu.core.interp import interpolate_to_points

    w = rng.normal(size=(27, 3, 4)).astype(np.float32) * 0.3
    B, L = vb_np.masks[0].shape

    def run(vb):
        out = np.asarray(sparse_conv(
            jnp.asarray(vb.vox_feats.reshape(B * L, 3)),
            jnp.asarray(vb.kmaps["same0k3"]), jnp.asarray(w)))
        out = out.reshape(B, L, 4)
        res = {}
        for b in range(B):
            n = int(vb.num_voxels[0][b])
            for i in range(n):
                res[(b,) + tuple(vb.coords[0][b, i])] = out[b, i]
        return res

    r1, r2 = run(vb_np), run(vb_nat)
    assert r1.keys() == r2.keys()
    for kk in r1:
        np.testing.assert_allclose(r1[kk], r2[kk], rtol=1e-4, atol=1e-5)

    # Interpolated point readout identical (order-independent by nature).
    def interp(vb):
        jb = vb.to_jax()
        return np.asarray(interpolate_to_points(
            jnp.asarray(vb.vox_feats), jb.interp_idx, jb.interp_w,
            jb.point_to_voxel))

    np.testing.assert_allclose(interp(vb_np), interp(vb_nat), rtol=1e-4,
                               atol=1e-5)


def test_native_kernel_map_merge_join_guard():
    """The native merge-join kernel maps (csrc csn_shape_kernel_map: packed
    key + constant delta, two-pointer merge) fall back to hash lookups when
    coords approach the 21-bit lane bias. Kernel maps are invariant under a
    constant integer translation (sorted voxel order is preserved), so the
    same shape shifted by +600000 voxels (> 2^19 guard -> hash path) must
    produce bit-identical tables to the in-range shape (merge path)."""
    from csn_tpu.core import native

    if not native.available():
        pytest.skip("native engine not built")
    maps = [MapSpec("same", 0, 3), MapSpec("same", 0, 5),
            MapSpec("down", 0, 3), MapSpec("up", 0, 3),
            MapSpec("same", 1, 3)]
    rng = np.random.default_rng(11)
    c, f, lab = make_shape(rng, 400)
    c = np.floor(c * 7.0)  # integer voxel-unit coords (voxel_size=1)
    spec = PyramidSpec(voxel_size=1.0, num_points=400,
                       level_caps=(448, 448, 448), maps=tuple(maps),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb_near = build_voxel_batch([(c, f, lab)], spec,
                                rng=np.random.default_rng(5),
                                use_native=True)
    vb_far = build_voxel_batch([(c + 600000.0, f, lab)], spec,
                               rng=np.random.default_rng(5),
                               use_native=True)
    for name in vb_near.kmaps:
        np.testing.assert_array_equal(vb_near.kmaps[name],
                                      vb_far.kmaps[name], err_msg=name)
    np.testing.assert_array_equal(vb_near.point_to_voxel,
                                  vb_far.point_to_voxel)
    np.testing.assert_array_equal(vb_near.interp_idx, vb_far.interp_idx)


def test_point_to_voxel_roundtrip():
    shapes, spec, vb = build([], n=200, B=2)
    B, L = vb.masks[0].shape
    for b in range(B):
        c, _, _ = shapes[b]
        ic = np.floor(c / spec.voxel_size).astype(np.int64)
        for p in range(0, 200, 37):
            idx = vb.point_to_voxel[b, p]
            assert idx < B * L
            np.testing.assert_array_equal(
                vb.coords[0].reshape(B * L, 3)[idx], ic[p]
            )


def test_concat_jax_batches_matches_joint_build():
    """Device-side concat of two B-shape batches must equal one 2B-shape
    build: identical index spaces, sentinels, masks and features (the basis
    of the single (K+1)*B CSN backbone pass)."""
    from csn_tpu.core.pyramid import concat_jax_batches

    maps = [MapSpec("same", 0, 3), MapSpec("down", 0, 3), MapSpec("up", 0, 3)]
    rng = np.random.default_rng(3)
    shapes = [make_shape(rng, 400) for _ in range(4)]
    spec = PyramidSpec(voxel_size=1.0, num_points=400,
                       level_caps=default_level_caps(400, 2, shrink=1.0),
                       maps=tuple(maps), qmode=QMode.UNWEIGHTED_AVERAGE)
    b1 = build_voxel_batch(shapes[:2], spec)
    b2 = build_voxel_batch(shapes[2:], spec)
    joint = build_voxel_batch(shapes, spec)

    cat = concat_jax_batches([b1.to_jax(), b2.to_jax()])
    # joint reference in ABSOLUTE (decoded) indices: concat decodes int16
    # wire tables before remapping, so compare decoded-to-decoded
    jj = joint.to_jax(compact=False)
    for name in jj.kmaps:
        got = np.asarray(cat.kmaps[name])
        if not name.startswith("win!"):
            assert got.dtype == np.int32, name  # concat decoded the wire
        np.testing.assert_array_equal(got, np.asarray(jj.kmaps[name]),
                                      err_msg=name)
    # int16 interp deltas / f16 floats are concat-invariant wire formats:
    # the encoded joint build matches the concat of encoded parts exactly
    enc_joint = joint.to_jax()
    np.testing.assert_array_equal(np.asarray(cat.interp_idx),
                                  np.asarray(enc_joint.interp_idx))
    np.testing.assert_array_equal(np.asarray(cat.interp_w),
                                  np.asarray(enc_joint.interp_w))
    np.testing.assert_array_equal(np.asarray(cat.point_to_voxel),
                                  np.asarray(jj.point_to_voxel))
    np.testing.assert_array_equal(np.asarray(cat.vox_feats),
                                  np.asarray(enc_joint.vox_feats))
    for l in range(2):
        np.testing.assert_array_equal(np.asarray(cat.masks[l]),
                                      np.asarray(jj.masks[l]))


def test_compact_wire_roundtrip():
    """int16 kmap wire encoding is lossless; compact to_jax drops
    points/coords; decode_kmap restores absolute indices exactly."""
    import jax.numpy as jnp

    from csn_tpu.core.pyramid import decode_kmap, encode_kmap16

    rng = np.random.default_rng(0)
    B, n = 2, 1500
    shapes = [(rng.uniform(-1, 1, (n, 3)).astype(np.float32),
               rng.normal(size=(n, 3)).astype(np.float32),
               np.zeros(n, np.int32)) for _ in range(B)]
    spec = PyramidSpec(voxel_size=0.08, num_points=n, level_caps=(704, 352),
                       maps=(MapSpec("same", 0, 3), MapSpec("down", 0, 3),
                             MapSpec("up", 0, 3)))
    vb = build_voxel_batch(shapes, spec)
    jb = vb.to_jax()          # compact default
    assert jb.points is None and jb.coords is None
    full = vb.to_jax(compact=False)
    assert full.points is not None
    wire = sum(int(np.asarray(v).nbytes) for v in jb.kmaps.values())
    fullb = sum(int(np.asarray(v).nbytes) for v in full.kmaps.values())
    assert wire < 0.6 * fullb
    for name, enc in jb.kmaps.items():
        if name.startswith("win!"):
            continue
        src_l = 1 if name.startswith("up") else 0
        n_in = B * spec.level_caps[src_l]
        assert enc.dtype == jnp.int16, name
        dec = np.asarray(decode_kmap(enc, n_in))
        np.testing.assert_array_equal(dec, vb.kmaps[name], err_msg=name)
    # spread exceeding int16 -> encoder declines (int32 kept, no corruption)
    big = np.zeros((1, 512), np.int32)
    big[0, ::2] = 120000
    assert encode_kmap16(big, 130000) is None


def test_encode_kmap16_native_matches_numpy(monkeypatch):
    """The C++ wire encoder (csrc csn_encode_kmap16) is bit-identical to
    the numpy reference over randomized tables: mixed sentinels, all-
    sentinel rows, negative deltas, and the int16-overflow decline."""
    from csn_tpu.core import native
    from csn_tpu.core import pyramid as P

    if not native.available() or native.encode_kmap16_native(
            np.zeros((1, 4), np.int32), 4, P.WIRE_TILE) is None:
        import pytest as _pt
        _pt.skip("native engine unavailable")

    rng = np.random.default_rng(3)
    cases = []
    for n_out in (256, 512, 1280):
        for K in (1, 9, 27):
            n_in = int(rng.integers(64, 4 * n_out))
            base = (np.arange(n_out) // P.WIRE_TILE) * (
                (P.WIRE_TILE * n_in) // n_out)
            km = (base[None, :]
                  + rng.integers(-300, 300, size=(K, n_out))).astype(
                      np.int32)
            km = np.clip(km, 0, n_in - 1)
            km[rng.random(size=km.shape) < 0.3] = n_in  # sentinels
            cases.append((km, n_in))
    cases.append((np.full((3, 256), 77, np.int32), 77))   # all sentinel
    big = np.zeros((2, 512), np.int32)
    big[0, ::2] = 120000                                  # overflow
    cases.append((big, 130000))
    for km, n_in in cases:
        nat = native.encode_kmap16_native(km, n_in, P.WIRE_TILE)
        # force the numpy path for the reference result
        monkeypatch.setattr(native, "encode_kmap16_native",
                            lambda *a, **k: None)
        ref = P.encode_kmap16(km, n_in)
        monkeypatch.undo()
        if ref is None:
            assert nat == -1 or nat is None
        else:
            np.testing.assert_array_equal(np.asarray(nat), ref)
            # and the dispatcher returns the same table
            np.testing.assert_array_equal(P.encode_kmap16(km, n_in), ref)


def test_concat_jax_batches_mixed_wire_and_missing_worklists(caplog):
    """Per-batch wire fallbacks in ONE input (int32 interp table, a dropped
    win! worklist after overflow) must not crash or corrupt the concat: a
    naive concat would KeyError on the missing worklist and silently
    promote the other batch's int16 interp DELTAS next to int32 ABSOLUTES.
    Mixed inputs must produce the same absolute semantics as the all-int16
    concat, minus the dropped worklist."""
    from csn_tpu.core.interp import decode_interp_idx
    from csn_tpu.core.pyramid import concat_jax_batches

    rng = np.random.default_rng(5)
    spec = PyramidSpec(voxel_size=0.05, num_points=2000, level_caps=(1280,),
                       maps=(MapSpec("same", 0, 3),),
                       qmode=QMode.UNWEIGHTED_AVERAGE, use_windows=True)

    def shapes(seed):
        r = np.random.default_rng(seed)
        pts = r.uniform(-1, 1, (2000, 3)).astype(np.float32)
        return [(pts, pts.copy(), np.zeros(2000, np.int32)) for _ in range(2)]

    b1 = build_voxel_batch(shapes(0), spec).to_jax()
    b2 = build_voxel_batch(shapes(1), spec).to_jax()
    assert b1.interp_idx.dtype == np.int16
    wink = next(k for k in b2.kmaps if k.startswith("win!same"))

    ref = concat_jax_batches([b1, b2])

    n0_2 = b2.masks[0].shape[0] * b2.masks[0].shape[1]
    b2m = b2.replace(
        kmaps={k: v for k, v in b2.kmaps.items() if k != wink},
        interp_idx=decode_interp_idx(b2.interp_idx, b2.point_to_voxel, n0_2))
    cat = concat_jax_batches([b1, b2m])

    assert wink not in cat.kmaps and wink in ref.kmaps
    assert cat.interp_idx.dtype == np.int32
    n0 = ref.point_to_voxel.shape[0] * ref.masks[0].shape[1]
    np.testing.assert_array_equal(
        np.asarray(cat.interp_idx),
        np.asarray(decode_interp_idx(ref.interp_idx, ref.point_to_voxel,
                                     n0)))
    for k in cat.kmaps:
        np.testing.assert_array_equal(np.asarray(cat.kmaps[k]),
                                      np.asarray(ref.kmaps[k]), err_msg=k)

    # the drop must be LOUD in both directions: a worklist missing only in
    # batch 0 is just as dropped as one missing in a later batch (the
    # warning used to be computed from batch 0's keys only)
    import logging
    for order in ([b1, b2m], [b2m, b1]):
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            out = concat_jax_batches(order)
        assert wink not in out.kmaps
        assert any(wink in r.getMessage() for r in caplog.records), order
