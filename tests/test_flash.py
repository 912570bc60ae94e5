"""Pallas flash attention vs dense reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from csn_tpu.ops.attention import scaled_dot_product_attention


def _flash_interpret(q, k, v, mask, temperature):
    """Run the pallas kernel in interpreter mode (no TPU needed)."""
    import csn_tpu.ops.flash as F

    with F.interpret_mode():
        out, _lse = F._flash_forward(q, k, v, mask, None, temperature,
                                     block_q=16, block_k=128)
        return out


def test_flash_matches_dense_interpret():
    rng = np.random.default_rng(0)
    b, h, lq, lk, d = 2, 2, 24, 200, 16
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    mask = np.ones((b, lk), dtype=bool)
    mask[0, 150:] = False
    mask = jnp.asarray(mask)

    ref = scaled_dot_product_attention(q, k, v, mask, temperature=4.0)
    out = _flash_interpret(q, k, v, mask, 4.0)
    # kernel uses bf16 MXU operands -> bf16-level tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_flash_no_mask_interpret():
    rng = np.random.default_rng(1)
    b, h, lq, lk, d = 1, 1, 16, 128, 8
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    ref = scaled_dot_product_attention(q, k, v, None, temperature=2.0)
    out = _flash_interpret(q, k, v, None, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)
