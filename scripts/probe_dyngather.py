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


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    run("take(axis=0) f32", k_take)
    run("take_along_axis(axis=0) f32", k_take_along)
    run("take(axis=0) bf16", k_take, jnp.bfloat16)
    run("take_along_axis lane-dim via T", k_take_along_t)


if __name__ == "__main__":
    main()
