"""Per-op cost breakdown of the CSN train step on TPU.

Each op is timed as a lax.scan of ITERS applications inside ONE jit call
(state evolves through the carry, so the axon relay cannot memoize, and
dispatch overhead is excluded). Run:
    PALLAS_AXON_REMOTE_COMPILE=1 python scripts/opbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

from bench import make_surface_shape
from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
from csn_tpu.models import load_model

ITERS = 10


def timed_scan(name, body, init):
    """body(carry) -> carry; time ITERS iterations inside one jit."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c,
                            None, length=ITERS)[0]

    c = run(init)  # compile
    jax.block_until_ready(c)
    t0 = time.time()
    c = run(c)
    jax.block_until_ready(c)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    cls = load_model("HRNetSimCSN3S")
    use_win = os.environ.get("OPBENCH_WINDOWS", "1") == "1"
    spec = pyramid_spec_for_model(cls, num_points=10000, voxel_size=0.05,
                                  conv1_kernel_size=5, level0_cap=5632,
                                  shrink=3.0, use_windows=use_win)
    B = 16  # combined 2x8 (query+key), as in the real K=1 step
    vb = collate_shapes([make_surface_shape(rng, 10000) for _ in range(B)],
                        spec, rng=rng)
    jb = vb.to_jax()
    L0, L1, L2 = spec.level_caps
    N0, N1, N2 = B * L0, B * L1, B * L2
    print(f"caps={spec.level_caps} N0={N0} windows={use_win}")

    from csn_tpu.core.conv import sparse_conv

    def conv_pair(name, n_in, n_out, cin, cout, mirror):
        from csn_tpu.core.pyramid import decode_kmap
        from csn_tpu.models.layers import transpose_map_name

        # decode the int16 wire tables exactly as SparseConv does
        # (models/layers.py): raw wire kmaps reaching the Pallas kernels
        # are an i16 vector.load Mosaic cannot align
        kmap = decode_kmap(jb.kmaps[name], n_in)
        tname, mir = transpose_map_name(name)
        kmap_t = (kmap if tname == name
                  else decode_kmap(jb.kmaps[tname], n_out))
        win = jb.kmaps.get("win!" + name)
        k = kmap.shape[0]
        ks = int(name.rsplit("k", 1)[1])
        group = ks * ks  # one window per dx-slab (25 for the k5 stem)
        w0 = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32)
                         * 0.05)
        x0 = jnp.asarray(rng.normal(size=(n_in, cin)).astype(np.float32))

        from csn_tpu.core.window_conv import align_for_map, window_for_map

        wwin, wwin_t = window_for_map(name), window_for_map(tname)
        wal, wal_t = align_for_map(name), align_for_map(tname)
        win_t = jb.kmaps.get("win!" + tname)

        def fwd_body(c):
            x, w = c
            out = sparse_conv(x, kmap, w, kmap_t=kmap_t, mirror=mir,
                              win_starts=win, win_starts_t=win_t,
                              win_group=group, win_window=wwin,
                              win_window_t=wwin_t, win_align=wal,
                              win_align_t=wal_t)
            # mix output back into the input (shape-compatible only when
            # n_in == n_out and cin == cout; pad/slice otherwise)
            if out.shape == x.shape:
                x = x + 1e-6 * out
            else:
                x = x * (1.0 + 1e-7 * jnp.mean(out))
            return (x, w)

        def bwd_body(c):
            x, w = c

            def loss(x, w):
                o = sparse_conv(x, kmap, w, kmap_t=kmap_t, mirror=mir,
                                win_starts=win, win_starts_t=win_t,
                                win_group=group, win_window=wwin,
                                win_window_t=wwin_t, win_align=wal,
                                win_align_t=wal_t)
                return jnp.sum(o * o) * 1e-6

            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return (x + 1e-6 * gx, w + 1e-6 * gw)

        f = timed_scan(f"{name} {cin}->{cout} fwd", fwd_body, (x0, w0))
        fb = timed_scan(f"{name} {cin}->{cout} fwd+bwd", bwd_body, (x0, w0))
        return f, fb

    # OPBENCH_ONLY=convs|attn|interp|<map name> runs a subset (each entry is
    # its own 1-10 min remote compile; subsets make A/B env sweeps cheap)
    only = os.environ.get("OPBENCH_ONLY", "")

    def want(section):
        return not only or only in section

    if want("convs same0k5"):
        conv_pair("same0k5", N0, N0, 3, 32, True)     # stem conv0
    if want("convs same0k3"):
        conv_pair("same0k3", N0, N0, 32, 64, True)    # stem conv1
        conv_pair("same0k3", N0, N0, 64, 64, True)    # stage blocks L0
    if want("convs same1k3"):
        conv_pair("same1k3", N1, N1, 128, 128, True)
    if want("convs same2k3"):
        conv_pair("same2k3", N2, N2, 256, 256, True)
    if want("convs down0k3 up0k3"):
        conv_pair("down0k3", N0, N1, 64, 128, False)
        conv_pair("up0k3", N1, N0, 128, 64, False)
    if want("convs down1k3 up1k3"):
        conv_pair("down1k3", N1, N2, 128, 256, False)
        conv_pair("up1k3", N2, N1, 256, 128, False)

    # attention: one SSA MHA at bench scale (B=16 combined, L0, d=256, H=4)
    from csn_tpu.ops.attention import MultiHeadAttention

    mask = jb.masks[0]
    if want("attn"):
        mha = MultiHeadAttention(n_head=4, d_model=256, d_k=64, d_v=64,
                                 dropout=0.0, use_flash=True)
        x0 = jnp.asarray(rng.normal(size=(B, L0, 256)).astype(np.float32))
        v0 = jax.jit(lambda r, x: mha.init(r, x, x, x, mask))(
            jax.random.PRNGKey(0), x0)

        def mha_fwd(c):
            return c + 1e-6 * mha.apply(v0, c, c, c, mask)

        def mha_bwd(c):
            g = jax.grad(lambda x: jnp.sum(mha.apply(v0, x, x, x, mask) ** 2)
                         * 1e-6)(c)
            return c + 1e-6 * g

        timed_scan("MHA flash fwd (B16,L0,d256,H4)", mha_fwd, x0)
        timed_scan("MHA flash fwd+bwd", mha_bwd, x0)

    # masked BN fwd+bwd at L0 width 64
    from csn_tpu.models.layers import MaskedBatchNorm

    if want("attn bn"):
        bn = MaskedBatchNorm()
        xb = jnp.asarray(rng.normal(size=(B, L0, 64)).astype(np.float32))
        vb_bn = bn.init(jax.random.PRNGKey(0), xb, mask, False)

        def bn_bwd(c):
            def loss(x):
                y, _ = bn.apply(vb_bn, x, mask, True,
                                mutable=["batch_stats"])
                return jnp.sum(y * y) * 1e-6

            return c + 1e-6 * jax.grad(loss)(c)

        timed_scan("MaskedBN L0x64 fwd+bwd", bn_bwd, xb)

    # interp + loss
    from csn_tpu.core.interp import interpolate_to_points
    from csn_tpu.train.losses import cross_entropy_ignore

    xo = jnp.asarray(rng.normal(size=(B, L0, 39)).astype(np.float32))

    if want("interp"):

        def interp_bwd(c):
            def loss(x):
                pl = interpolate_to_points(x, jb.interp_idx, jb.interp_w,
                                           jb.point_to_voxel)
                return cross_entropy_ignore(pl, jb.labels, 255,
                                            jb.point_mask)

            return c + 1e-3 * jax.grad(loss)(c)

        timed_scan("interp+CE fwd+bwd (39 cls)", interp_bwd, xo)

    if want("interp") and "win!interp_f" in jb.kmaps:
        from csn_tpu.core.interp import interp_batch

        def interp_win_bwd(c):
            def loss(x):
                pl = interp_batch(x, jb)
                return cross_entropy_ignore(pl, jb.labels, 255, jb.point_mask)

            return c + 1e-3 * jax.grad(loss)(c)

        timed_scan("windowed interp+CE fwd+bwd (39 cls)", interp_win_bwd, xo)


if __name__ == "__main__":
    main()
