"""Probe v2: Mosaic dynamic_gather with SHAPE-MATCHED operands.

probe_dyngather.py showed every mismatched-shape form fails with
"Shape mismatch in input, indices and output" — i.e. Mosaic's
tpu.dynamic_gather requires input.shape == indices.shape == output.shape.
This probe tests the matched forms the windowed conv could actually use:

  A. sublane gather, matched: win [W, C], idx broadcast [W, C] -> out [W, C]
     (gather W rows from a W-row window; the conv's T=256 < W=384 output
     rows are the first T rows of a padded W-row gather)
  B. same but W == T == 256 (window shrunk to the tile size)
  C. lane-dim gather on the transposed layout [C, W] with matched shapes
  D. one-hot matmul baseline timing at the same matched geometry

If A or B compiles, the im2col DYNG kernels can run with indices padded to
the window height; report timing vs the one-hot construction.
"""

import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

C = 128


def run(name, kernel, W, T, dtype=jnp.float32):
    win = np.random.default_rng(0).normal(size=(W, C)).astype(np.float32)
    rel = np.random.default_rng(1).integers(0, W, size=(T,)).astype(np.int32)
    rel_pad = np.zeros((W,), np.int32)
    rel_pad[:T] = rel
    want = win[rel]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((W, C), dtype),
        )(jnp.asarray(win, dtype), jnp.asarray(rel_pad))
        out = np.asarray(out, np.float32)[:T]
        err = np.abs(out - want).max()
        print(f"{name:44s} COMPILES  max_err={err:.2e}")
        return True
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).split("\n") if l.strip()]
        msg = (lines[0] if lines else repr(e))[:140]
        print(f"{name:44s} FAILS: {msg}")
        if os.environ.get("PROBE_VERBOSE"):
            traceback.print_exc()
        return False


def k_matched_sublane(win_ref, rel_ref, out_ref):
    W = win_ref.shape[0]
    idx = jnp.broadcast_to(rel_ref[...][:, None], (W, C))
    out_ref[...] = jnp.take_along_axis(win_ref[...], idx, axis=0)


def k_matched_lane(win_ref, rel_ref, out_ref):
    W = win_ref.shape[0]
    wt = win_ref[...].T  # [C, W]
    idx = jnp.broadcast_to(rel_ref[...][None, :], (C, W))
    out_ref[...] = jnp.take_along_axis(wt, idx, axis=1).T


def _timing_kernel(rows_ref, win_ref, out_ref, *, mode: str, k_offsets: int,
                   W: int, T: int):
    acc = jnp.zeros((T, C), jnp.float32)
    win = win_ref[...]
    for k in range(k_offsets):
        rows = rows_ref[k, :]
        valid = (rows >= 0) & (rows < W)
        safe = jnp.where(valid, rows, 0)
        one = jnp.int32(0x3F800000)
        if mode == "gather":
            # matched-shape gather: pad the T row ids to W (wrap), gather
            # [W, C], keep the first T rows
            idx_w = jnp.pad(safe, (0, W - T))  # static pad
            g = jnp.take_along_axis(
                win, jnp.broadcast_to(idx_w[:, None], (W, C)), axis=0)[:T]
            m = jnp.where(valid, one, 0)[:, None]
            acc += g.astype(jnp.float32) * pltpu.bitcast(m, jnp.float32)
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
            hit = jnp.where(jnp.where(valid, rows, -1)[:, None] == cols,
                            one, 0)
            oh = pltpu.bitcast(hit, jnp.float32).astype(jnp.bfloat16)
            acc += jax.lax.dot_general(
                oh, win.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[...] = acc


def time_modes(W=384, T=256, n_tiles=352, k_offsets=9, iters=20):
    rng = np.random.default_rng(2)
    rows = jnp.asarray(rng.integers(
        0, W, size=(n_tiles * k_offsets, T)).astype(np.int32))
    win0 = jnp.asarray(rng.normal(size=(W, C)).astype(np.float32))

    for mode in ("onehot", "gather"):
        kern = functools.partial(_timing_kernel, mode=mode,
                                 k_offsets=k_offsets, W=W, T=T)
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
            return win * (1.0 + 1e-9 * out[0, 0]), out

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
            print(f"timing {mode:8s} W={W} {dt:7.3f} ms/call  "
                  f"{per_job:6.2f} us/(tile x {k_offsets} offsets)")
        except Exception as e:  # noqa: BLE001
            lines = [l for l in str(e).split("\n") if l.strip()]
            print(f"timing {mode:8s} FAILS: {(lines[0] if lines else '?')[:120]}")


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok1 = run("matched sublane gather W=384", k_matched_sublane, 384, 256)
    ok2 = run("matched sublane gather W=256", k_matched_sublane, 256, 256)
    run("matched sublane gather bf16", k_matched_sublane, 384, 256,
        jnp.bfloat16)
    run("matched lane gather (transposed)", k_matched_lane, 256, 256)
    if ok1 or ok2:
        time_modes()


if __name__ == "__main__":
    main()
