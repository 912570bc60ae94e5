"""Pinpoint the unsupported dynamic_slice in the interp backward kernel.

interp_window's FORWARD compiles and matches XLA on v5e; the BACKWARD fails
with "Unimplemented primitive ... dynamic_slice". The backward differs from
every working conv kernel in one way: it value-loads SMALL-sublane scratches
([nbuf, 8, window] idx/w tables) at a dynamic slot index, where the working
kernels only ever dynamically index [nbuf, window, cpad] f32 scratches.

Each probe is a tiny kernel with a fori_loop over jobs and a dynamic slot
load, isolating one pattern:

  P3 control   [2, 256, 128] f32  load s[j%2]            (conv pattern; works)
  P1           [2, 8, 512]  i32  load s[j%2]
  P2           [2, 8, 512]  f32  load s[j%2]
  P4           [2, 8, 512]  i32  load s[j%2][k]  k static (the interp form)
  P5 fix       [2, 8, 512]  i32  unrolled where-select over slots

Whichever P fails names the culprit; if P5 compiles the fix is mechanical.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))

NB, W, CP = 2, 512, 128


def probe(name, shape, dtype, body):
    def kernel(x_ref, out_ref, s_ref):
        s_ref[...] = jnp.zeros_like(s_ref)
        # fill slot 0 from the input so the load is not dead code
        s_ref[0] = x_ref[...].astype(dtype)

        def job(j, acc):
            return acc + body(s_ref, j)

        out_ref[...] = jax.lax.fori_loop(0, 3, job,
                                         jnp.zeros((8, 128), jnp.float32))

    x = np.random.default_rng(0).normal(size=shape[1:]).astype(np.float32)
    try:
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM(shape, dtype)],
        )(jnp.asarray(x))
        print(f"{name:55s} COMPILES")
        return True
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).split("\n") if l.strip()]
        print(f"{name:55s} FAILS: {(lines[0] if lines else '?')[:120]}")
        return False


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    probe("P3 control f32 [2,256,128] load s[j%2]", (NB, 256, CP),
          jnp.float32,
          lambda s, j: s[j % NB][:8, :128])

    probe("P1 i32 [2,8,512] load s[j%2]", (NB, 8, W), jnp.int32,
          lambda s, j: s[j % NB][:, :128].astype(jnp.float32))

    probe("P2 f32 [2,8,512] load s[j%2]", (NB, 8, W), jnp.float32,
          lambda s, j: s[j % NB][:, :128])

    def p4(s, j):
        row = s[j % NB][3, :]                      # [W]
        return jnp.broadcast_to(row[None, :128], (8, 128)).astype(jnp.float32)

    probe("P4 i32 [2,8,512] row load s[j%2][k]", (NB, 8, W), jnp.int32, p4)

    def p5(s, j):
        v = s[0][...]
        for slot in range(1, NB):
            v = jnp.where(j % NB == slot, s[slot][...], v)
        return v[:, :128].astype(jnp.float32)

    probe("P5 fix i32 [2,8,512] where-select slots", (NB, 8, W),
          jnp.int32, p5)


if __name__ == "__main__":
    main()


def extra():
    def p6(s, j):
        row = s[j % NB][3:4, :]                    # [1, W] slice, no squeeze
        return jnp.broadcast_to(row[:, :128], (8, 128)).astype(jnp.float32)

    probe("P6 fix i32 [2,8,512] slice load s[j%2][k:k+1]", (NB, 8, W),
          jnp.int32, p6)

    def p7(s, j):
        v = s[j % NB][...]                         # one full-slot load
        row = jax.lax.slice_in_dim(v, 3, 4, axis=0)
        return jnp.broadcast_to(row[:, :128], (8, 128)).astype(jnp.float32)

    probe("P7 full-slot load then lax.slice", (NB, 8, W), jnp.int32, p7)


if os.environ.get("PROBE_EXTRA"):
    extra()
