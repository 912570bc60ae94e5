"""Attention semantics vs a numpy reference of the post-norm residual MHA
(`MinkowskiNet/models/attention.py:9-75`), plus masking invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from csn_tpu.ops.attention import MultiHeadAttention, compatibility_softmax


def numpy_mha(q, k, v, Wq, Wk, Wv, Wfc, ln_scale, ln_bias, n_head, d_k, d_v):
    """Reference math (eval mode, no dropout): heads, scaled dot-product,
    concat, fc, residual, LayerNorm(eps=1e-6)."""
    b, lq, dm = q.shape
    lk = k.shape[1]
    qh = (q @ Wq).reshape(b, lq, n_head, d_k).transpose(0, 2, 1, 3)
    kh = (k @ Wk).reshape(b, lk, n_head, d_k).transpose(0, 2, 1, 3)
    vh = (v @ Wv).reshape(b, lk, n_head, d_v).transpose(0, 2, 1, 3)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(d_k)
    scores = scores - scores.max(-1, keepdims=True)
    attn = np.exp(scores)
    attn = attn / attn.sum(-1, keepdims=True)
    out = attn @ vh
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, n_head * d_v)
    out = out @ Wfc + q
    mu = out.mean(-1, keepdims=True)
    var = out.var(-1, keepdims=True)
    return (out - mu) / np.sqrt(var + 1e-6) * ln_scale + ln_bias


def test_mha_matches_numpy_reference():
    rng = np.random.default_rng(0)
    b, l, dm, nh = 2, 12, 16, 4
    dk = dv = dm // nh
    q = rng.normal(size=(b, l, dm)).astype(np.float32)
    mha = MultiHeadAttention(n_head=nh, d_model=dm, d_k=dk, d_v=dv)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q),
                         jnp.asarray(q), jnp.asarray(q))
    out = np.asarray(mha.apply(variables, jnp.asarray(q), jnp.asarray(q),
                               jnp.asarray(q), train=False))
    p = variables["params"]
    ref = numpy_mha(
        q, q, q,
        np.asarray(p["w_qs"]["kernel"]), np.asarray(p["w_ks"]["kernel"]),
        np.asarray(p["w_vs"]["kernel"]), np.asarray(p["fc"]["kernel"]),
        np.asarray(p["LayerNorm_0"]["scale"]),
        np.asarray(p["LayerNorm_0"]["bias"]), nh, dk, dv)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_kv_mask_excludes_padded_keys():
    rng = np.random.default_rng(1)
    b, lq, lk, dm, nh = 1, 6, 10, 8, 2
    q = rng.normal(size=(b, lq, dm)).astype(np.float32)
    k_full = rng.normal(size=(b, lk, dm)).astype(np.float32)
    mha = MultiHeadAttention(n_head=nh, d_model=dm, d_k=dm // nh, d_v=dm // nh)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q),
                         jnp.asarray(k_full), jnp.asarray(k_full))
    mask = np.zeros((b, lk), dtype=bool)
    mask[:, :7] = True
    out_masked = np.asarray(mha.apply(
        variables, jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(k_full),
        jnp.asarray(mask), train=False))
    # same as physically truncating the keys
    out_trunc = np.asarray(mha.apply(
        variables, jnp.asarray(q), jnp.asarray(k_full[:, :7]),
        jnp.asarray(k_full[:, :7]), train=False))
    np.testing.assert_allclose(out_masked, out_trunc, rtol=1e-4, atol=1e-5)

    # changing padded keys does not change the output
    k_mod = k_full.copy()
    k_mod[:, 7:] += 100.0
    out_mod = np.asarray(mha.apply(
        variables, jnp.asarray(q), jnp.asarray(k_mod), jnp.asarray(k_mod),
        jnp.asarray(mask), train=False))
    np.testing.assert_allclose(out_masked, out_mod, rtol=1e-5, atol=1e-5)


def test_dropout_active_only_in_train():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 8)).astype(np.float32)
    mha = MultiHeadAttention(n_head=2, d_model=8, d_k=4, d_v=4, dropout=0.5)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                         jnp.asarray(x))
    e1 = mha.apply(variables, x, x, x, train=False)
    e2 = mha.apply(variables, x, x, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1 = mha.apply(variables, x, x, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = mha.apply(variables, x, x, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_online_attention_matches_dense():
    from csn_tpu.ops.attention import (
        online_attention, scaled_dot_product_attention,
    )

    rng = np.random.default_rng(4)
    b, h, lq, lk, dk = 2, 3, 17, 37, 8
    q = jnp.asarray(rng.normal(size=(b, h, lq, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, dk)).astype(np.float32))
    mask = np.ones((b, lk), dtype=bool)
    mask[0, 30:] = False
    mask = jnp.asarray(mask)
    dense = scaled_dot_product_attention(q, k, v, mask)
    online = online_attention(q, k, v, mask, kv_block=16)
    np.testing.assert_allclose(np.asarray(online), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)

    # gradients agree too
    def f_dense(q):
        return jnp.sum(scaled_dot_product_attention(q, k, v, mask) ** 2)

    def f_online(q):
        return jnp.sum(online_attention(q, k, v, mask, kv_block=16) ** 2)

    gd = jax.grad(f_dense)(q)
    go = jax.grad(f_online)(q)
    np.testing.assert_allclose(np.asarray(go), np.asarray(gd), rtol=1e-3,
                               atol=1e-4)


def test_mha_auto_impl_consistent():
    from csn_tpu.ops.attention import MultiHeadAttention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 40, 8)).astype(np.float32))
    mask = jnp.asarray(np.arange(40)[None, :] < 33)
    m_dense = MultiHeadAttention(n_head=2, d_model=8, d_k=4, d_v=4,
                                 attn_impl="dense")
    m_online = MultiHeadAttention(n_head=2, d_model=8, d_k=4, d_v=4,
                                  attn_impl="online", kv_block=16)
    variables = m_dense.init(jax.random.PRNGKey(0), x, x, x)
    a = m_dense.apply(variables, x, x, x, mask, train=False)
    b = m_online.apply(variables, x, x, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_compatibility_softmax_semantics():
    rng = np.random.default_rng(3)
    qg = rng.normal(size=(3, 8)).astype(np.float32)
    qg /= np.linalg.norm(qg, axis=-1, keepdims=True)
    kg = rng.normal(size=(3, 4, 8)).astype(np.float32)
    kg /= np.linalg.norm(kg, axis=-1, keepdims=True)
    comp = np.asarray(compatibility_softmax(jnp.asarray(qg), jnp.asarray(kg),
                                            temperature=np.sqrt(8.0)))
    np.testing.assert_allclose(comp.sum(-1), 1.0, atol=1e-5)
    sims = np.einsum("bd,bkd->bk", qg, kg) / np.sqrt(8.0)
    e = np.exp(sims - sims.max(-1, keepdims=True))
    np.testing.assert_allclose(comp, e / e.sum(-1, keepdims=True), atol=1e-5)
