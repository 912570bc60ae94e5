"""Probe: does Mosaic on this v5e support an in-VMEM dynamic row gather?

The windowed conv (core/window_conv.py) emulates `out[i] = win[rel[i]]` with
a [TILE, W] one-hot matmul because no per-row gather was known to lower.
Its budget is ~55% VPU one-hot construction (STATUS.md). If `jnp.take` /
`take_along_axis` along the SUBLANE dim lowers inside a Pallas TPU kernel,
the kernel could gather each offset's rows directly ([T, C] work instead of
[T, W]) and feed ONE im2col matmul [T, K*C] @ [K*C, Cout] per tile.

Run on the TPU box:  PALLAS_AXON_REMOTE_COMPILE=1 python scripts/probe_dyngather.py
Prints per-variant: COMPILES + exactness vs numpy, or the Mosaic error.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

T, W, C = 256, 384, 128


def run(name, kernel, dtype=jnp.float32):
    win = np.random.default_rng(0).normal(size=(W, C)).astype(np.float32)
    rel = np.random.default_rng(1).integers(0, W, size=(T,)).astype(np.int32)
    want = win[rel]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, C), dtype),
        )(jnp.asarray(win, dtype), jnp.asarray(rel))
        out = np.asarray(out, np.float32)
        err = np.abs(out - want).max()
        print(f"{name:40s} COMPILES  max_err={err:.2e}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name:40s} FAILS: {msg}")
        if os.environ.get("PROBE_VERBOSE"):
            traceback.print_exc()
        return False


def k_take(win_ref, rel_ref, out_ref):
    out_ref[...] = jnp.take(win_ref[...], rel_ref[...], axis=0)


def k_take_along(win_ref, rel_ref, out_ref):
    idx = jnp.broadcast_to(rel_ref[...][:, None], (T, C))
    out_ref[...] = jnp.take_along_axis(win_ref[...], idx, axis=0)


def k_take_along_t(win_ref, rel_ref, out_ref):
    # transpose layout: gather along the LANE dim of [C, W] instead
    wt = win_ref[...].T  # [C, W] — relayout; Mosaic may or may not fold it
    idx = jnp.broadcast_to(rel_ref[...][None, :], (C, T))
    out_ref[...] = jnp.take_along_axis(wt, idx, axis=1).T


def _timing_kernel(rows_ref, win_ref, out_ref, *, mode: str, k_offsets: int):
    """Per grid step: K offsets' row gathers from one [W, C] window,
    accumulated — the inner loop of the windowed conv without DMA/meta
    machinery. mode='onehot' replays the production one-hot matmul;
    mode='take' the dynamic gather."""
    acc = jnp.zeros((T, C), jnp.float32)
    win = win_ref[...]
    for k in range(k_offsets):
        rows = rows_ref[k, :]
        if mode == "take":
            valid = (rows >= 0) & (rows < W)
            g = jnp.take(win, jnp.where(valid, rows, 0), axis=0)
            one = jnp.int32(0x3F800000)
            m = jnp.where(valid, one, 0)[:, None]
            acc += g.astype(jnp.float32) * pltpu.bitcast(m, jnp.float32)
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            one = jnp.int32(0x3F800000)
            hit = jnp.where(rows[:, None] == cols, one, 0)
            oh = pltpu.bitcast(hit, jnp.float32).astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                oh, win, dimension_numbers=((((1,), (0,))), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[...] = acc


def time_modes(n_tiles=352, k_offsets=9, iters=20):
    """Carry-evolving timing (axon relay memoizes identical inputs)."""
    import functools
    import time

    rng = np.random.default_rng(2)
    rows = jnp.asarray(rng.integers(
        0, W, size=(n_tiles * k_offsets, T)).astype(np.int32))
    win0 = jnp.asarray(
        rng.normal(size=(W, C)).astype(np.float32)).astype(jnp.bfloat16)

    for mode in ("onehot", "take"):
        kern = functools.partial(_timing_kernel, mode=mode,
                                 k_offsets=k_offsets)
        call = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((k_offsets, T), lambda t: (t, 0)),
                      pl.BlockSpec((W, C), lambda t: (0, 0))],
            out_specs=pl.BlockSpec((T, C), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles * T, C), jnp.float32),
        )

        @jax.jit
        def step(win, r):
            out = call(r, win)
            return win * (1.0 + 1e-9 * out[0, 0].astype(jnp.bfloat16)), out

        try:
            w = win0
            w, out = step(w, rows)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(iters):
                w, out = step(w, rows)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / iters * 1e3
            per_job = dt / n_tiles * 1e3
            print(f"timing {mode:8s} {dt:7.3f} ms/call  "
                  f"{per_job:6.2f} us/(tile x {k_offsets} offsets)")
        except Exception as e:  # noqa: BLE001
            print(f"timing {mode:8s} FAILS: {str(e).splitlines()[0][:120]}")


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok = run("take(axis=0) f32", k_take)
    run("take_along_axis(axis=0) f32", k_take_along)
    okb = run("take(axis=0) bf16", k_take, jnp.bfloat16)
    run("take_along_axis lane-dim via T", k_take_along_t)
    if ok or okb:
        time_modes()


if __name__ == "__main__":
    main()
