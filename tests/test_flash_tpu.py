"""TPU-hardware flash-attention tests (compiled Mosaic path).

The CPU suite exercises the kernels in interpreter mode; these run the real
compiled kernels and the full custom-vjp backward. They need the TPU, so they
are skipped unless RUN_TPU_TESTS=1 (run via:
  RUN_TPU_TESTS=1 python -m pytest tests/test_flash_tpu.py --no-header -q
from an environment where jax sees the TPU)."""

import os

import numpy as np
import pytest

RUN = os.environ.get("RUN_TPU_TESTS", "0") == "1"
pytestmark = pytest.mark.skipif(not RUN, reason="RUN_TPU_TESTS != 1")

if RUN:
    import jax

    if jax.devices()[0].platform == "cpu":
        pytestmark = pytest.mark.skip(reason="no TPU visible")


def setup_module(module):
    global jax, jnp, flash_attention, scaled_dot_product_attention
    import jax
    import jax.numpy as jnp
    from csn_tpu.ops.flash import flash_attention
    from csn_tpu.ops.attention import scaled_dot_product_attention


def test_flash_fwd_bwd_exact_on_tpu():
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, D = 2, 4, 700, 1500, 64
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    mask = np.ones((B, Lk), dtype=bool)
    mask[0, 1200:] = False
    mask = jnp.asarray(mask)

    ref = np.asarray(scaled_dot_product_attention(q, k, v, mask,
                                                   temperature=8.0))
    out = np.asarray(flash_attention(q, k, v, mask, temperature=8.0))
    # kernels use bf16 MXU operands -> bf16-level tolerance
    assert np.abs(out - ref).max() < 0.01 * np.abs(ref).max()

    gr = np.asarray(jax.grad(lambda q: jnp.sum(scaled_dot_product_attention(
        q, k, v, mask, temperature=8.0) ** 2))(q))
    gf = np.asarray(jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, mask, temperature=8.0) ** 2))(q))
    assert np.abs(gf - gr).max() < 0.03 * np.abs(gr).max()


def test_flash_midfc_geometry_on_tpu():
    """Flash parity at the MID-FC chunked geometry now shipped as the TPU
    training default (csn_tpu/midfc: [B*20 chunks, 8 heads, 500, d_k=256
    PER HEAD], no kv mask): forward + q-grad vs the dense reference."""
    rng = np.random.default_rng(1)
    B, H, L, D = 20, 8, 500, 256
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    t = float(D) ** 0.5

    ref = np.asarray(scaled_dot_product_attention(q, k, v, temperature=t))
    out = np.asarray(flash_attention(q, k, v, temperature=t))
    assert np.abs(out - ref).max() < 0.01 * np.abs(ref).max()

    gr = np.asarray(jax.grad(lambda q: jnp.sum(scaled_dot_product_attention(
        q, k, v, temperature=t) ** 2))(q))
    gf = np.asarray(jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, temperature=t) ** 2))(q))
    assert np.abs(gf - gr).max() < 0.03 * np.abs(gr).max()


def test_flash_qmask_block_skip_matches_reference():
    """Ragged q/kv masks (whole blocks fully padded => skipped in-kernel):
    outputs and all three grads must still match the dense reference on the
    valid rows, with no NaNs anywhere."""
    rng = np.random.default_rng(2)
    B, H, Lq, Lk, D = 3, 2, 1536, 1600, 64
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    kvm = jnp.asarray(np.arange(Lk)[None, :] < np.array([700, 1600, 150])[:, None])
    qm = jnp.asarray(np.arange(Lq)[None, :] < np.array([600, 1536, 200])[:, None])

    def loss(fn, q, k, v):
        o = fn(q, k, v)
        o = jnp.where(qm[:, None, :, None], o, 0.0)
        return jnp.sum(jnp.sin(o))

    gf = jax.grad(lambda *a: loss(
        lambda q, k, v: flash_attention(q, k, v, kvm, qm, temperature=8.0),
        *a), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(
        lambda q, k, v: scaled_dot_product_attention(q, k, v, kvm,
                                                     temperature=8.0),
        *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        assert np.abs(a - b).max() < 0.01 * max(np.abs(b).max(), 1.0)


def test_flash_dropout_mask_invariant_to_kv_block_size():
    """REGRESSION: the dropout mask must depend on absolute positions, not
    the kv block raster. Forward and backward use different block_k (1024
    vs 768); when the mask followed the block shape, the backward dropped
    different entries than the forward — a biased gradient that sent real
    training NaN within ~50 iterations. Outputs across block_k choices may
    differ only by online-softmax accumulation-order noise (same level as
    the dropout=0 control), never by O(1) mask flips."""
    from csn_tpu.ops.flash import _flash_forward

    rng = np.random.default_rng(3)
    B, H, LQ, LK, D = 2, 2, 1024, 1536, 64
    q = jnp.asarray(rng.normal(size=(B, H, LQ, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, LK, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, LK, D)).astype(np.float32))
    kvm = jnp.asarray(np.arange(LK)[None, :] < np.array([1100, 1536])[:, None])
    seed = jnp.asarray([99], jnp.int32)

    def run(drop, bk):
        o, _ = jax.jit(lambda q, k, v: _flash_forward(
            q, k, v, kvm, None, 8.0, drop, seed, 512, bk))(q, k, v)
        return np.asarray(o)

    control = np.abs(run(0.0, 1536) - run(0.0, 768)).max()   # order noise
    for bk in (768, 512, 384):
        diff = np.abs(run(0.2, 1536) - run(0.2, bk)).max()
        assert diff < 10 * max(control, 1e-6), (bk, diff, control)


def test_flash_dropout_seed_sensitivity_and_mean():
    rng = np.random.default_rng(1)
    B, H, L, D = 1, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)
    f = jax.jit(lambda q, s: flash_attention(q, q, q, mask, seed=s,
                                             temperature=8.0, dropout=0.5))
    outs = [np.asarray(f(q, jnp.asarray([s * 7 + 1]))) for s in range(16)]
    assert np.abs(outs[0] - outs[1]).max() > 0, "dropout mask ignores the seed"
    ref = np.asarray(scaled_dot_product_attention(q, q, q, mask,
                                                  temperature=8.0))
    mean = np.mean(outs, axis=0)
    mean_dev = np.abs(mean - ref).mean()
    single_dev = np.abs(outs[0] - ref).mean()
    # averaging over seeds must shrink the dropout noise substantially
    assert mean_dev < 0.5 * single_dev


def test_window_conv_fwd_bwd_exact_on_tpu():
    """Worklist windowed conv (fwd one-hot gather + fused d_feats/dW bwd) vs
    the XLA gather path, on MIXED geometry (sphere shells + planar patches —
    the planar case broke round-1's fixed one-window-per-tile layout)."""
    from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, \
        build_voxel_batch
    from csn_tpu.core.window_conv import window_jobs, window_conv_fwd
    from csn_tpu.core.conv import sparse_conv

    rng = np.random.default_rng(0)

    def mixed(n=10000):
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate([a, np.full((n - k, 1),
                                           rng.uniform(-0.5, 0.5))], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        return pts, np.zeros((n, 1), np.float32), np.zeros(n, np.int32)

    B, L = 4, 5632
    spec = PyramidSpec(voxel_size=0.05, num_points=10000, level_caps=(L,),
                       maps=(MapSpec("same", 0, 3),),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch([mixed() for _ in range(B)], spec)
    kmap_np = vb.kmaps["same0k3"]
    N = B * L
    C = 64
    feats = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)
    kmap = jnp.asarray(kmap_np)
    ref = np.asarray(sparse_conv(feats, kmap, w))
    scale = np.abs(ref).max()

    meta = jnp.asarray(window_jobs(kmap_np, N, group=9))
    out = np.asarray(jax.jit(
        lambda f, k, m, w: window_conv_fwd(f, k, m, w, group=9))(
        feats, kmap, meta, w))
    assert np.abs(out - ref).max() < 0.01 * scale

    # full custom-vjp path: windowed fwd + fused windowed bwd vs gather bwd
    def loss_win(f, w):
        o = sparse_conv(f, kmap, w, kmap_t=kmap, mirror=True,
                        win_starts=meta, win_group=9)
        return jnp.sum(o * o)

    def loss_ref(f, w):
        o = sparse_conv(f, kmap, w, kmap_t=kmap, mirror=True)
        return jnp.sum(o * o)

    gf_w, gw_w = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(feats, w)
    gf_r, gw_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(feats, w)
    gf_w, gw_w, gf_r, gw_r = map(np.asarray, (gf_w, gw_w, gf_r, gw_r))
    assert np.abs(gf_w - gf_r).max() < 0.02 * np.abs(gf_r).max()
    assert np.abs(gw_w - gw_r).max() < 0.02 * np.abs(gw_r).max()


def test_window_conv_k5_stem_and_strided_on_tpu():
    """Windowed conv parity for the k5 stem (cin=3: channel padding in both
    kernels) and the strided down/up pair (backward gathers from the OTHER
    level's row space via the transpose map's worklist)."""
    from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, \
        build_voxel_batch
    from csn_tpu.core.window_conv import window_jobs
    from csn_tpu.core.conv import sparse_conv

    rng = np.random.default_rng(1)

    def mixed(n=8000):
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate([a, np.full((n - k, 1),
                                           rng.uniform(-0.5, 0.5))], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        return pts, np.zeros((n, 1), np.float32), np.zeros(n, np.int32)

    B, L0, L1 = 4, 5632, 1880
    spec = PyramidSpec(voxel_size=0.05, num_points=8000,
                       level_caps=(L0, L1),
                       maps=(MapSpec("same", 0, 5), MapSpec("down", 0, 3),
                             MapSpec("up", 0, 3)),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch([mixed() for _ in range(B)], spec)
    N0, N1 = B * L0, B * L1

    def grads(loss):
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    # --- k5 stem, cin=3 -> 32 (same-level: shared worklist, mirror) -------
    k5 = jnp.asarray(vb.kmaps["same0k5"])
    meta5 = jnp.asarray(window_jobs(vb.kmaps["same0k5"], N0, group=25))
    x3 = jnp.asarray(rng.normal(size=(N0, 3)).astype(np.float32))
    w5 = jnp.asarray(rng.normal(size=(125, 3, 32)).astype(np.float32) * 0.1)

    def loss5(x, w, win, win_t):
        o = sparse_conv(x, k5, w, kmap_t=k5, mirror=True, win_starts=win,
                        win_starts_t=win_t, win_group=25)
        return jnp.sum(o * o)

    gx_w, gw_w = grads(lambda x, w: loss5(x, w, meta5, meta5))(x3, w5)
    gx_r, gw_r = grads(lambda x, w: loss5(x, w, None, None))(x3, w5)
    assert np.abs(np.asarray(gx_w) - np.asarray(gx_r)).max() \
        < 0.02 * np.abs(np.asarray(gx_r)).max()
    assert np.abs(np.asarray(gw_w) - np.asarray(gw_r)).max() \
        < 0.02 * np.abs(np.asarray(gw_r)).max()

    # --- strided down conv (bwd worklist = the up map's) ------------------
    kd = jnp.asarray(vb.kmaps["down0k3"])
    ku = jnp.asarray(vb.kmaps["up0k3"])
    metad = jnp.asarray(window_jobs(vb.kmaps["down0k3"], N0, group=9,
                                    cap_mult=2.0))
    metau = jnp.asarray(window_jobs(vb.kmaps["up0k3"], N1, group=9,
                                    cap_mult=2.0))
    xd = jnp.asarray(rng.normal(size=(N0, 32)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(27, 32, 64)).astype(np.float32) * 0.1)

    def lossd(x, w, win, win_t):
        o = sparse_conv(x, kd, w, kmap_t=ku, mirror=False, win_starts=win,
                        win_starts_t=win_t, win_group=9)
        return jnp.sum(o * o)

    out_w = np.asarray(jax.jit(
        lambda x, w: sparse_conv(x, kd, w, kmap_t=ku, win_starts=metad,
                                 win_group=9))(xd, wd))
    out_r = np.asarray(jax.jit(
        lambda x, w: sparse_conv(x, kd, w, kmap_t=ku))(xd, wd))
    assert np.abs(out_w - out_r).max() < 0.01 * np.abs(out_r).max()
    gx_w, gw_w = grads(lambda x, w: lossd(x, w, metad, metau))(xd, wd)
    gx_r, gw_r = grads(lambda x, w: lossd(x, w, None, None))(xd, wd)
    assert np.abs(np.asarray(gx_w) - np.asarray(gx_r)).max() \
        < 0.02 * max(np.abs(np.asarray(gx_r)).max(), 1e-3)
    assert np.abs(np.asarray(gw_w) - np.asarray(gw_r)).max() \
        < 0.02 * np.abs(np.asarray(gw_r)).max()


def test_combined_csa_windows_match_gather_on_tpu():
    """The combined (K+1)B CSA backbone pass with windowed convs must match
    the gather path. Exercises the win!-meta concatenation in
    concat_jax_batches (per-batch tile/start offsets) — regression for a bug
    where only the query batch's window jobs survived concatenation and the
    key batch's conv outputs were never written."""
    from csn_tpu.core.pyramid import QMode
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model

    rng = np.random.default_rng(3)

    def mixed(n=2000):
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate([a, np.full((n - k, 1), 0.3)], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        labels = (pts[:, 0] > 0).astype(np.int32) + 1
        return pts, pts.copy(), labels

    cls = load_model("HRNetSimCSN2S")
    B = 2
    shapes_q = [mixed() for _ in range(B)]
    shapes_k = [mixed() for _ in range(B)]
    batches = {}
    for win in (False, True):
        # level0_cap 1280: B*L % 256 == 0 at every level so the per-batch
        # window grids stay concatenable
        spec = pyramid_spec_for_model(
            cls, num_points=2000, voxel_size=0.05, conv1_kernel_size=3,
            level0_cap=1280, shrink=2.0, qmode=QMode.UNWEIGHTED_AVERAGE,
            use_windows=win)
        assert all((B * c) % 256 == 0 for c in spec.level_caps), \
            spec.level_caps
        qb = collate_shapes(shapes_q, spec).to_jax()
        kb = collate_shapes(shapes_k, spec).to_jax()
        if win:
            assert any(k.startswith("win!") for k in qb.kmaps)
        batches[win] = (qb, kb)

    model = cls(out_channels=5, conv1_kernel_size=3, d_model=32, n_head=2,
                k_neighbors=1, use_flash=False)
    qb0, kb0 = batches[False]
    variables = jax.jit(lambda r, b, k: model.init(r, b, k, train=False))(
        jax.random.PRNGKey(0), qb0, (kb0,))
    outs = {}
    for win, (qb, kb) in batches.items():
        outs[win] = np.asarray(jax.jit(
            lambda v, b, k: model.apply(v, b, k, train=False))(
            variables, qb, (kb,)))
    scale = np.abs(outs[False]).max()
    assert np.abs(outs[True] - outs[False]).max() < 0.02 * scale, \
        np.abs(outs[True] - outs[False]).max()


def _window_conv_parity_check(rng_seed=7):
    """Mixed-geometry batch + parity `check` closure shared by the opt-in
    windowed-conv variants (lane packing, dynamic gather). Env knobs must be
    set BEFORE calling (metas bake in window/align choices)."""
    from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, \
        build_voxel_batch
    from csn_tpu.core.window_conv import align_for_map, window_for_map, \
        window_jobs
    from csn_tpu.core.conv import sparse_conv

    rng = np.random.default_rng(rng_seed)

    def mixed(n=8000):
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate([a, np.full((n - k, 1),
                                           rng.uniform(-0.5, 0.5))], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        return pts, np.zeros((n, 1), np.float32), np.zeros(n, np.int32)

    B, L0, L1 = 4, 5632, 1880
    spec = PyramidSpec(voxel_size=0.05, num_points=8000,
                       level_caps=(L0, L1),
                       maps=(MapSpec("same", 0, 3), MapSpec("same", 0, 5),
                             MapSpec("down", 0, 3), MapSpec("up", 0, 3)),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch([mixed() for _ in range(B)], spec)
    N0, N1 = B * L0, B * L1

    def meta_for(name, n_in, group=9, cap_mult=2.0):
        return (jnp.asarray(window_jobs(
            vb.kmaps[name], n_in, window=window_for_map(name), group=group,
            cap_mult=cap_mult, align=align_for_map(name))),
            window_for_map(name), align_for_map(name))

    def check(name, cin, cout, kmt_name, mirror, group=9):
        kmap = jnp.asarray(vb.kmaps[name])
        kmap_t = jnp.asarray(vb.kmaps[kmt_name])
        n_in = N1 if name.startswith("up") else N0
        n_in_t = N1 if kmt_name.startswith("up") else N0
        meta, w_win, al = meta_for(name, n_in, group)
        meta_t, w_win_t, al_t = meta_for(kmt_name, n_in_t, group)
        x = jnp.asarray(rng.normal(size=(n_in, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(group * 3 if group == 9 else 125, cin,
                             cout)).astype(np.float32) * 0.1)

        def loss(x, w, use_win):
            o = sparse_conv(
                x, kmap, w, kmap_t=kmap_t, mirror=mirror,
                win_starts=meta if use_win else None,
                win_starts_t=meta_t if use_win else None, win_group=group,
                win_window=w_win, win_window_t=w_win_t, win_align=al,
                win_align_t=al_t)
            return jnp.sum(o * o)

        fwd_w = np.asarray(jax.jit(lambda x, w: sparse_conv(
            x, kmap, w, kmap_t=kmap_t, mirror=mirror, win_starts=meta,
            win_group=group, win_window=w_win, win_align=al))(x, w))
        fwd_r = np.asarray(jax.jit(lambda x, w: sparse_conv(
            x, kmap, w, kmap_t=kmap_t, mirror=mirror))(x, w))
        scale = np.abs(fwd_r).max()
        assert np.abs(fwd_w - fwd_r).max() < 0.01 * scale, name
        g = jax.jit(jax.grad(lambda x, w: loss(x, w, True), argnums=(0, 1)))
        r = jax.jit(jax.grad(lambda x, w: loss(x, w, False), argnums=(0, 1)))
        (gx_w, gw_w), (gx_r, gw_r) = g(x, w), r(x, w)
        gx_w, gw_w, gx_r, gw_r = map(np.asarray, (gx_w, gw_w, gx_r, gw_r))
        assert np.abs(gx_w - gx_r).max() < 0.02 * max(np.abs(gx_r).max(),
                                                      1e-3), name
        assert np.abs(gw_w - gw_r).max() < 0.02 * np.abs(gw_r).max(), name

    return check


def test_window_conv_lane_packed_parity_on_tpu(monkeypatch):
    """Lane-packed windowed conv (pack p source rows into the 128-lane dim;
    one-hot contracts over W/p packed rows + post-gather lane-group select)
    vs the XLA gather path, at every packing the experiment supports: C=32
    (p=4), C=64 (p=2), and the k5 stem (Cin=3, p=16 fwd / p=4 bwd).
    Packing is opt-in (measured slower end-to-end; window_conv.pack_enabled
    documents the series) — exactness stays covered here."""
    monkeypatch.setenv("CSN_PACK", "1")
    check = _window_conv_parity_check()
    check("same0k3", 32, 32, "same0k3", True)    # p=4 fwd+bwd
    check("same0k3", 64, 64, "same0k3", True)    # p=2 fwd+bwd
    check("same0k3", 32, 64, "same0k3", True)    # p=4 fwd, p=2 bwd
    check("down0k3", 64, 128, "up0k3", False)    # p=2 fwd, p=1 bwd
    check("up0k3", 128, 64, "down0k3", False)    # p=1 fwd, p=2 bwd
    check("same0k5", 3, 32, "same0k5", True, group=25)  # p=16 fwd, p=4 bwd


@pytest.mark.parametrize("mode", ["1", "2", "3"])
def test_window_conv_dyngather_parity_on_tpu(monkeypatch, mode):
    """CSN_DYNG=1 (in-VMEM `jnp.take` row gather replacing the one-hot
    matmul in the tile-grid kernels), CSN_DYNG=2 (im2col: gathers fill a
    [T, K*C] scratch, ONE apply matmul per tile fwd, one-matmul dW bwd)
    and CSN_DYNG=3 (im2col with static group dispatch — no dynamic-lane
    -offset store) vs the XLA gather path — fwd + fused bwd, incl. the
    multi-window-per-(tile,group) mask case, the k5 stem's tiny channels,
    and the strided down/up pair. Skips (rather than fails) iff Mosaic
    cannot lower the gather — scripts/probe_dyngather.py is the standalone
    probe."""
    monkeypatch.setenv("CSN_DYNG", mode)
    check = _window_conv_parity_check(rng_seed=11)
    try:
        check("same0k3", 64, 64, "same0k3", True)
    except Exception as e:  # noqa: BLE001
        # v5e verdict (scripts/probe_dyngather2.py): tpu.dynamic_gather
        # demands input==indices==output shapes ("Shape mismatch in input,
        # indices and output") AND a single source vreg along the gather
        # dim — these modes can never lower on this hardware gen.
        if "omparison" in str(e) or "gather" in str(e).lower() \
                or "Mosaic" in str(e) or "lower" in str(e).lower() \
                or "Shape mismatch in input" in str(e):
            import pytest as _pt
            _pt.skip(f"Mosaic cannot lower the dynamic gather: "
                     f"{str(e).splitlines()[0][:120]}")
        raise
    check("same0k3", 32, 64, "same0k3", True)
    check("down0k3", 64, 128, "up0k3", False)
    check("up0k3", 128, 64, "down0k3", False)
    check("same0k5", 3, 32, "same0k5", True, group=25)


def test_window_conv_skip_empty_parity_on_tpu(monkeypatch):
    """CSN_SKIP_EMPTY=1 (per-offset pl.when(any valid) around the one-hot
    gather + matmuls in the tile-grid kernels; ~11% of (job, offset) pairs
    are empty at bench geometry — scripts/probe_offset_skip.py) vs the XLA
    gather path. Exactness is unconditional (a skipped offset contributes
    exact zeros); this pins the pl.when wiring fwd + fused bwd across the
    same/strided/k5 family."""
    monkeypatch.setenv("CSN_SKIP_EMPTY", "1")
    check = _window_conv_parity_check(rng_seed=13)
    check("same0k3", 64, 64, "same0k3", True)
    check("down0k3", 64, 128, "up0k3", False)
    check("up0k3", 128, 64, "down0k3", False)
    check("same0k5", 3, 32, "same0k5", True, group=25)


def test_window_conv_banked_onehot_parity_on_tpu(monkeypatch):
    """CSN_BANKED=1 (bank-factored one-hot, window_conv.banked_mode) vs the
    XLA gather path. Opt-in only: measured SLOWER on v5e (same0k3 fwd
    4.3 -> 6.1 ms, k5 stem 10.1 -> 17.6 — the [T, 1] bank indicators and
    split matmuls cost more than the narrower compare saves), the third
    refuted structural one-hot attack after CSN_PACK and narrow windows;
    exactness stays covered here for future hardware gens."""
    monkeypatch.setenv("CSN_BANKED", "1")
    check = _window_conv_parity_check(rng_seed=7)
    check("same0k3", 64, 64, "same0k3", True)
    check("down0k3", 64, 128, "up0k3", False)
    check("same0k5", 3, 32, "same0k5", True, group=25)


def test_ring_flash_single_chip_on_tpu():
    """n=1 flash ring (carry kernel + XLA finalize, no hops) == plain
    flash_attention on the real chip — values and the full custom-vjp
    backward (VERDICT r3 item 3's single-chip-provable parity)."""
    from jax.sharding import PartitionSpec as P

    from csn_tpu.ops.attention import ring_flash_attention
    from csn_tpu.parallel.midfc import make_midfc_mesh

    rng = np.random.default_rng(21)
    B, H, L, D = 2, 4, 768, 64
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    mask = np.ones((B, L), dtype=bool)
    mask[0, 600:] = False
    mask = jnp.asarray(mask)

    mesh = make_midfc_mesh(1, 1)
    ring = jax.shard_map(
        lambda a, b_, c, d: ring_flash_attention(a, b_, c, d, axis="seq",
                                                 temperature=8.0),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, None, "seq", None), P(None, "seq")),
        out_specs=P(None, None, "seq", None), check_vma=False)

    out_r = np.asarray(ring(q, k, v, mask))
    out_f = np.asarray(flash_attention(q, k, v, mask, temperature=8.0))
    assert np.abs(out_r - out_f).max() < 1e-5 * max(np.abs(out_f).max(), 1.0)

    g_r = jax.grad(lambda q_, k_, v_: jnp.sum(ring(q_, k_, v_, mask) ** 2),
                   argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention(
        q_, k_, v_, mask, temperature=8.0) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_r, g_f):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(b).max(), 1.0)


def test_ring_flash_dropout_deterministic_on_tpu():
    """In-kernel TPU-PRNG dropout through the flash ring: same rng => same
    output (fwd determinism is what makes the ring backward regenerate the
    exact forward mask), different rng => different output, and the
    dropout=0 path equals the no-dropout ring."""
    from jax.sharding import PartitionSpec as P

    from csn_tpu.ops.attention import ring_flash_attention
    from csn_tpu.parallel.midfc import make_midfc_mesh

    rng = np.random.default_rng(22)
    B, H, L, D = 1, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))

    mesh = make_midfc_mesh(1, 1)

    def run(key, rate):
        f = jax.shard_map(
            lambda a, b_, c, kk: ring_flash_attention(
                a, b_, c, None, axis="seq", dropout_rate=rate,
                dropout_rng=kk[0]),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                      P(None, None, "seq", None), P()),
            out_specs=P(None, None, "seq", None), check_vma=False)
        return np.asarray(f(q, k, v, jax.random.PRNGKey(int(key))[None]))

    a1 = run(123, 0.3)
    a2 = run(123, 0.3)
    b1 = run(456, 0.3)
    np.testing.assert_array_equal(a1, a2)
    assert np.abs(a1 - b1).max() > 1e-4  # masks actually differ

    no_drop = run(123, 0.0)
    plain = jax.shard_map(
        lambda a, b_, c: ring_flash_attention(a, b_, c, None, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)(q, k, v)
    np.testing.assert_array_equal(no_drop, np.asarray(plain))

    # dropped grads stay finite through the ring backward
    f = jax.shard_map(
        lambda a, b_, c, kk: ring_flash_attention(
            a, b_, c, None, axis="seq", dropout_rate=0.3,
            dropout_rng=kk[0]),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, None, "seq", None), P()),
        out_specs=P(None, None, "seq", None), check_vma=False)
    g = jax.grad(lambda q_: jnp.sum(
        f(q_, k, v, jax.random.PRNGKey(9)[None]) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()
