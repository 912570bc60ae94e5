"""Host-side window-job worklist invariants (core/window_conv.window_jobs).

The Pallas kernels rely on these properties (no device needed to check them):
* every valid source row of every offset falls in EXACTLY one of its
  (tile, group) windows — disjoint coverage, no double counting;
* starts are sublane-aligned (multiples of 8) and in-bounds given the
  window-row padding;
* per output tile exactly one F_FIRST and one F_LAST job, jobs sorted by
  tile, padding jobs inactive.
"""

import numpy as np

from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, build_voxel_batch
from csn_tpu.core.window_conv import (
    F_ACTIVE, F_FIRST, F_LAST, TILE, WINDOW, window_jobs,
)


def _mixed_geometry_kmap(B=2, L=1024, n=2000, seed=0):
    rng = np.random.default_rng(seed)

    def mixed():
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate(
            [a, np.full((n - k, 1), rng.uniform(-0.5, 0.5))], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        return pts, np.zeros((n, 1), np.float32), np.zeros(n, np.int32)

    spec = PyramidSpec(voxel_size=0.08, num_points=n, level_caps=(L,),
                       maps=(MapSpec("same", 0, 3),),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch([mixed() for _ in range(B)], spec)
    return vb.kmaps["same0k3"], B * L


def test_window_jobs_invariants():
    kmap, n_in = _mixed_geometry_kmap()
    group = 9
    meta = window_jobs(kmap, n_in, group=group)
    tiles, groups, starts, flags = meta[0], meta[1], meta[2], meta[3]
    active = (flags & F_ACTIVE) != 0

    # alignment + bounds (feats are padded by WINDOW rows)
    assert (starts % 8 == 0).all()
    assert (starts[active] >= 0).all()
    assert (starts[active] <= n_in).all()

    # jobs sorted by tile; per tile exactly one FIRST and one LAST
    at = tiles[active]
    assert (np.diff(at) >= 0).all()
    K, n_out = kmap.shape
    n_tiles = -(-n_out // TILE)
    firsts = tiles[((flags & F_FIRST) != 0)]
    lasts = tiles[((flags & F_LAST) != 0)]
    assert sorted(firsts.tolist()) == list(range(n_tiles))
    assert sorted(lasts.tolist()) == list(range(n_tiles))

    # exact coverage: each valid source row matches exactly one window of
    # its (tile, group)
    pad = (-n_out) % TILE
    km = np.concatenate([kmap, np.full((K, pad), n_in, kmap.dtype)], axis=1)
    for t in range(n_tiles):
        for g in range(K // group):
            wins = starts[active & (tiles == t) & (groups == g)]
            rows = km[g * group:(g + 1) * group,
                      t * TILE:(t + 1) * TILE].reshape(-1)
            rows = rows[rows < n_in]
            if rows.size == 0:
                continue
            hits = ((rows[:, None] >= wins[None, :])
                    & (rows[:, None] < wins[None, :] + WINDOW)).sum(axis=1)
            assert (hits == 1).all(), (t, g)


def test_window_jobs_split_windows_cover_wide_spreads():
    """Adversarial spread >> WINDOW (the case that broke round-1's fixed
    one-window layout): sources of one tile alternate between far-apart
    ranges; the worklist must emit multiple disjoint windows per (tile,
    group) and still cover every row exactly once."""
    rng = np.random.default_rng(1)
    n_in, n_out, K, group = 8192, 512, 27, 9
    kmap = np.empty((K, n_out), np.int32)
    for k in range(K):
        lowhigh = rng.integers(0, 2, size=n_out).astype(bool)
        low = rng.integers(0, 600, size=n_out)
        high = rng.integers(n_in - 600, n_in, size=n_out)
        kmap[k] = np.where(lowhigh, high, low)
    # sprinkle sentinels
    kmap[0, ::17] = n_in

    meta = window_jobs(kmap, n_in, group=group)
    tiles, groups, starts, flags = meta[0], meta[1], meta[2], meta[3]
    active = (flags & F_ACTIVE) != 0
    n_tiles = n_out // TILE
    assert int(active.sum()) > n_tiles * (K // group), "no split windows"
    assert (starts % 8 == 0).all()
    for t in range(n_tiles):
        for g in range(K // group):
            wins = starts[active & (tiles == t) & (groups == g)]
            rows = kmap[g * group:(g + 1) * group,
                        t * TILE:(t + 1) * TILE].reshape(-1)
            rows = rows[rows < n_in]
            hits = ((rows[:, None] >= wins[None, :])
                    & (rows[:, None] < wins[None, :] + WINDOW)).sum(axis=1)
            assert (hits == 1).all(), (t, g)


def test_window_jobs_align_invariants():
    """align=64/256 (lane-packed kernels): starts are align-multiples,
    coverage stays exact, dummy/padding starts are 0 (always aligned)."""
    kmap, n_in = _mixed_geometry_kmap()
    for align, wdw in ((64, 384), (64, 512), (256, 512)):
        meta = window_jobs(kmap, n_in, window=wdw, group=9, align=align)
        tiles, groups, starts, flags = meta[0], meta[1], meta[2], meta[3]
        active = (flags & F_ACTIVE) != 0
        assert (starts % align == 0).all()
        assert (starts[~active] == 0).all()
        K = kmap.shape[0]
        n_tiles = -(-kmap.shape[1] // TILE)
        pad = (-kmap.shape[1]) % TILE
        km = np.concatenate([kmap, np.full((K, pad), n_in, kmap.dtype)],
                            axis=1)
        for t in range(n_tiles):
            for g in range(K // 9):
                wins = starts[active & (tiles == t) & (groups == g)]
                rows = km[g * 9:(g + 1) * 9,
                          t * TILE:(t + 1) * TILE].reshape(-1)
                rows = rows[rows < n_in]
                if rows.size == 0:
                    continue
                hits = ((rows[:, None] >= wins[None, :])
                        & (rows[:, None] < wins[None, :] + wdw)).sum(axis=1)
                assert (hits == 1).all(), (align, wdw, t, g)


def test_runtime_pack(monkeypatch):
    from csn_tpu.core.window_conv import pack_of, runtime_pack

    assert pack_of(3) == 16 and pack_of(32) == 4 and pack_of(64) == 2
    assert pack_of(128) == 1 and pack_of(256) == 1 and pack_of(96) == 1
    # packing is an opt-in experiment (measured slower; see pack_enabled)
    assert runtime_pack(32, 384, 64) == 1
    monkeypatch.setenv("CSN_PACK", "1")
    # bounded by the meta alignment
    assert runtime_pack(32, 384, 64) == 4
    assert runtime_pack(32, 384, 16) == 1
    assert runtime_pack(3, 512, 256) == 16
    # bounded by W % (16p) == 0 (packed window must stay a sublane mult)
    assert runtime_pack(3, 384, 256) == 8
    assert runtime_pack(64, 384, 64) == 2


def test_native_window_jobs_matches_numpy():
    """The C++ worklist builder (csrc csn_window_jobs) is bit-identical to
    the numpy reference on both realistic and adversarial geometry."""
    from csn_tpu.core import native
    from csn_tpu.core import window_conv as W

    if native.window_jobs_native(np.zeros((9, 256), np.int32), 10,
                                 W.TILE, 512, 9, 128) is None:
        import pytest

        pytest.skip("native engine not built")

    def numpy_jobs(kmap, n_in, window, group, cap_mult=1.5, align=16):
        # force the numpy path by monkeypatching the native call away
        orig = native.window_jobs_native
        native.window_jobs_native = lambda *a, **k: None
        try:
            return window_jobs(kmap, n_in, window=window, group=group,
                               cap_mult=cap_mult, align=align)
        finally:
            native.window_jobs_native = orig

    kmap, n_in = _mixed_geometry_kmap()
    for wdw, grp, align in ((512, 9, 16), (384, 9, 16), (384, 3, 16),
                            (384, 9, 64), (512, 9, 256)):
        a = window_jobs(kmap, n_in, window=wdw, group=grp, align=align)
        b = numpy_jobs(kmap, n_in, wdw, grp, align=align)
        np.testing.assert_array_equal(a, b,
                                      err_msg=f"w={wdw} g={grp} a={align}")

    # adversarial wide-spread kmap (multi-window greedy path)
    rng = np.random.default_rng(1)
    n_in2, n_out, K = 8192, 512, 27
    km = np.empty((K, n_out), np.int32)
    for k in range(K):
        lowhigh = rng.integers(0, 2, size=n_out).astype(bool)
        km[k] = np.where(lowhigh, rng.integers(n_in2 - 600, n_in2, n_out),
                         rng.integers(0, 600, n_out))
    km[0, ::17] = n_in2
    for align in (16, 64):
        a = window_jobs(km, n_in2, group=9, cap_mult=2.0, align=align)
        b = numpy_jobs(km, n_in2, WINDOW, 9, cap_mult=2.0, align=align)
        np.testing.assert_array_equal(a, b)


def test_tiny_cap_mult_keeps_terminator_slot():
    """Row 4's terminator lives at column n_tiles, so cap must exceed
    n_tiles even when a tiny CSN_CAP_MULT would shrink it to exactly
    n_tiles == n_jobs (one job per tile): pre-fix the numpy builder raised
    IndexError and the C++ builder wrote one int32 past the [5, cap]
    buffer. Both builders must agree on the floored cap."""
    from csn_tpu.core import native

    n_out, tile = 1024, 8          # 128 tiles (a multiple of 64)
    kmap = (np.arange(n_out, dtype=np.int32)[None, :] % 16)
    n_tiles = n_out // tile

    def build():
        return window_jobs(kmap, n_in=64, tile=tile, group=1,
                           cap_mult=1e-6)

    meta = build()
    assert meta.shape[1] >= n_tiles + 1
    n_jobs = int(((meta[3] & F_ACTIVE) != 0).sum())
    assert n_jobs == n_tiles                       # one job per tile
    assert meta[4, n_tiles] == n_jobs              # terminator intact
    if native.window_jobs_native(np.zeros((1, 256), np.int32), 10,
                                 TILE, 512, 1, 128) is not None:
        orig = native.window_jobs_native
        native.window_jobs_native = lambda *a, **k: None
        try:
            np.testing.assert_array_equal(meta, build())
        finally:
            native.window_jobs_native = orig


def test_meta_row4_tile_ranges():
    """Row 4 (per-tile job column ranges for the tile-grid kernels):
    ranges partition [0, n_jobs); every active job in range t has tile t;
    and after concat_jax_batches the combined row 4 partitions the combined
    columns with batch offsets applied."""
    kmap, n_in = _mixed_geometry_kmap()
    meta = window_jobs(kmap, n_in, group=9)
    n_tiles = -(-kmap.shape[1] // TILE)
    r4 = meta[4]
    n_jobs = int(((meta[3] & F_ACTIVE) != 0).sum())
    assert r4[0] == 0 and r4[n_tiles] == n_jobs
    assert (np.diff(r4[:n_tiles + 1]) >= 0).all()
    for t in range(n_tiles):
        seg = meta[:, r4[t]:r4[t + 1]]
        act = (seg[3] & F_ACTIVE) != 0
        assert (seg[0][act] == t).all()

    # concat: combined row 4 must give each tile the right active jobs
    import jax.numpy as jnp

    from csn_tpu.core.pyramid import (
        MapSpec, PyramidSpec, QMode, build_voxel_batch, concat_jax_batches,
    )

    def shapes(seed, n=2000):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        return [(pts, pts.copy(), np.zeros(n, np.int32)) for _ in range(2)]

    spec = PyramidSpec(voxel_size=0.05, num_points=2000, level_caps=(1280,),
                       maps=(MapSpec("same", 0, 3),),
                       qmode=QMode.UNWEIGHTED_AVERAGE, use_windows=True)
    b1 = build_voxel_batch(shapes(0), spec)
    b2 = build_voxel_batch(shapes(1), spec)
    cat = concat_jax_batches([b1.to_jax(), b2.to_jax()])
    m = np.asarray(cat.kmaps["win!same0k3"])
    nt = 2 * 2 * 1280 // TILE
    r4 = m[4]
    assert (np.diff(r4[:nt + 1]) >= 0).all()
    assert r4[nt] <= m.shape[1]
    seen_active = 0
    for t in range(nt):
        seg = m[:, r4[t]:r4[t + 1]]
        act = (seg[3] & F_ACTIVE) != 0
        assert (seg[0][act] == t).all(), t
        seen_active += int(act.sum())
    total_active = int(((m[3] & F_ACTIVE) != 0).sum())
    assert seen_active == total_active  # every active job visited once


def test_im2col_dyngather_numpy_simulation():
    """Numpy simulation of the CSN_DYNG=2 im2col kernels (the Mosaic
    kernels cannot run off-TPU): replay the job worklist with masked row
    gathers into a [T, K*c_pack] im2col buffer, apply the stacked-weight
    matmul (fwd) / the one-matmul dW + unstack (bwd), and compare against
    the direct gather-conv reference. Validates the lane-block layout, the
    per-job window masking (multi-window tiles contribute each row exactly
    once) and the [cin, K, cout] dW unstack order used by
    window_conv_bwd's dyng == 2 path."""
    kmap, n_io = _mixed_geometry_kmap(seed=3)
    rng = np.random.default_rng(4)
    K = kmap.shape[0]
    cin, cout, group, window = 48, 24, 9, 256
    meta = window_jobs(kmap, n_io, window=window, group=group, cap_mult=3.0)
    feats = rng.normal(size=(n_io, cin)).astype(np.float32)
    w = rng.normal(size=(K, cin, cout)).astype(np.float32) * 0.1
    g = rng.normal(size=(n_io, cout)).astype(np.float32)

    c_pack = -(-cin // 128) * 128
    n_tiles = n_io // TILE
    cap = meta.shape[1]
    feats_p = np.zeros((n_io + window, c_pack), np.float32)
    feats_p[:n_io, :cin] = feats
    w_p = np.zeros((K, c_pack, cout), np.float32)
    w_p[:, :cin] = w
    wfull = w_p.reshape(K * c_pack, cout)

    def gathers(tile, lanes, table, src_p, n_src):
        """im2col accumulation for one output tile, as the kernel does."""
        ic = np.zeros((TILE, K * lanes), np.float32)
        for j in range(meta[4, tile], meta[4, tile + 1]):
            assert meta[3, j] & F_ACTIVE
            start, grp = meta[2, j], meta[1, j]
            for i in range(group):
                k = grp * group + i
                rows = table[k, tile * TILE:(tile + 1) * TILE]
                rel = rows - start
                valid = (rows < n_src) & (rel >= 0) & (rel < window)
                gthr = src_p[np.where(valid, start + np.where(valid, rel, 0),
                                      0)] * valid[:, None]
                ic[:, k * lanes:(k + 1) * lanes] += gthr
        return ic

    # ---- forward: per-tile im2col @ stacked weights vs direct gather conv
    out = np.zeros((n_io, cout), np.float32)
    for t in range(n_tiles):
        out[t * TILE:(t + 1) * TILE] = gathers(t, c_pack, kmap,
                                               feats_p, n_io) @ wfull
    ref = np.zeros_like(out)
    for k in range(K):
        valid = kmap[k] < n_io
        ref += np.where(valid[:, None], feats[np.minimum(kmap[k], n_io - 1)],
                        0) @ w[k]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # ---- backward: GG im2col serves d_feats AND the one-matmul dW --------
    cout_p = -(-cout // 128) * 128
    g_p = np.zeros((n_io + window, cout_p), np.float32)
    g_p[:n_io, :cout] = g
    wt = np.zeros((K, cout_p, cin), np.float32)
    wt[:, :cout] = np.swapaxes(w, 1, 2)
    wtfull = wt.reshape(K * cout_p, cin)
    d_feats = np.zeros((n_io, cin), np.float32)
    dw_flat = np.zeros((cin, K * cout_p), np.float32)
    for t in range(n_tiles):
        gg = gathers(t, cout_p, kmap, g_p, n_io)
        d_feats[t * TILE:(t + 1) * TILE] = gg @ wtfull
        dw_flat += feats[t * TILE:(t + 1) * TILE].T @ gg
    d_w = np.transpose(dw_flat.reshape(cin, K, cout_p), (1, 0, 2))[:, :, :cout]

    d_feats_ref = np.zeros_like(d_feats)
    d_w_ref = np.zeros_like(d_w)
    for k in range(K):
        valid = kmap[k] < n_io
        rows = np.minimum(kmap[k], n_io - 1)
        d_feats_ref += np.where(valid[:, None], g[rows], 0) @ w[k].T
        d_w_ref[k] = feats.T @ (g[rows] * valid[:, None])
    np.testing.assert_allclose(d_feats, d_feats_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(d_w, d_w_ref, rtol=1e-4, atol=2e-4)
