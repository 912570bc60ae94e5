"""Component microbenchmarks on TPU: sparse conv, attention variants."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    N = 8 * 5120
    for cin, cout, K in [(64, 64, 27), (256, 256, 27), (3, 32, 125)]:
        feats = jnp.asarray(rng.normal(size=(N, cin)).astype(np.float32))
        # realistic kernel maps: partial permutations (each offset map is
        # injective), ~80% occupancy
        rows, trows = [], []
        for _ in range(K):
            perm = rng.permutation(N)
            drop = rng.random(N) < 0.2
            r = np.where(drop, N, perm)
            t = np.full(N, N, dtype=np.int64)
            t[perm[~drop]] = np.nonzero(~drop)[0]
            rows.append(r)
            trows.append(t)
        kmap = jnp.asarray(np.stack(rows).astype(np.int32))
        kmap_t = jnp.asarray(np.stack(trows).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32))

        from csn_tpu.core.conv import sparse_conv

        f = jax.jit(lambda f_, k_, w_: sparse_conv(f_, k_, w_))
        dt = timeit(f, feats, kmap, w)
        traffic = K * N * cin * 4 * 1e-9
        print(f"conv {cin}->{cout} K={K}: {dt*1e3:.2f} ms "
              f"({traffic/dt:.0f} GB/s gather)", flush=True)

        fb = jax.jit(jax.grad(lambda f_: jnp.sum(sparse_conv(f_, kmap, w) ** 2)))
        dt = timeit(fb, feats)
        print(f"  grad scatter-bwd: {dt*1e3:.2f} ms", flush=True)

        fb2 = jax.jit(jax.grad(lambda f_: jnp.sum(
            sparse_conv(f_, kmap, w, kmap_t=kmap_t,
                        mirror=False) ** 2)))
        dt = timeit(fb2, feats)
        print(f"  grad gather-bwd: {dt*1e3:.2f} ms", flush=True)

        fbw = jax.jit(jax.grad(lambda w_: jnp.sum(
            sparse_conv(feats, kmap, w_, kmap_t=kmap_t,
                        mirror=False) ** 2)))
        dt = timeit(fbw, w)
        print(f"  gradW gather-bwd: {dt*1e3:.2f} ms", flush=True)

    B, H, L, D = 8, 4, 5120, 64
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)

    from csn_tpu.ops.attention import online_attention, \
        scaled_dot_product_attention
    from csn_tpu.ops.flash import flash_attention

    f = jax.jit(lambda q: online_attention(q, q, q, mask, temperature=8.0))
    print(f"online attn f32: {timeit(f, q)*1e3:.2f} ms", flush=True)
    fb = jax.jit(jax.grad(lambda q: jnp.sum(
        online_attention(q, q, q, mask, temperature=8.0) ** 2)))
    print(f"online attn f32 grad: {timeit(fb, q)*1e3:.2f} ms", flush=True)

    qb = q.astype(jnp.bfloat16)
    f = jax.jit(lambda q: online_attention(q, q, q, mask, temperature=8.0))
    print(f"online attn bf16-in: {timeit(f, qb)*1e3:.2f} ms", flush=True)

    f = jax.jit(lambda q: flash_attention(q, q, q, mask, 8.0))
    print(f"pallas flash f32: {timeit(f, q)*1e3:.2f} ms", flush=True)
    f = jax.jit(lambda q: flash_attention(q, q, q, mask, 8.0))
    print(f"pallas flash bf16: {timeit(f, qb)*1e3:.2f} ms", flush=True)

    f = jax.jit(lambda q: scaled_dot_product_attention(q, q, q, mask,
                                                       temperature=8.0))
    try:
        print(f"dense attn f32: {timeit(f, q)*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"dense attn f32: OOM? {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
