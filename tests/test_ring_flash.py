"""Flash-per-ring-block attention (VERDICT r3 item 3): the Pallas carry
kernels (ops/flash.py flash_forward_carry / flash_block_backward) driven by
ring_flash_attention must reproduce dense full attention, the online ring,
and plain flash_attention — values AND grads — on the virtual CPU mesh in
Pallas interpret mode. Dropout determinism lives in the TPU suite
(tests/test_flash_tpu.py): the in-kernel TPU PRNG has no CPU interpret
lowering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from csn_tpu.ops.flash import interpret_mode as interpret_pallas
from csn_tpu.parallel.midfc import make_midfc_mesh

# These are VIRTUAL-CPU-MESH tests (interpret-mode Pallas over a 4-device
# ring); under RUN_TPU_TESTS=1 the backend is the single real TPU chip, where
# the multi-hop mesh cannot exist — the single-chip ring-flash hardware
# coverage lives in tests/test_flash_tpu.py instead.
needs_4_devices = pytest.mark.skipif(
    len(jax.devices()) < 4,
    reason="needs a 4-device (virtual CPU) mesh; single-chip ring-flash "
           "hardware coverage lives in tests/test_flash_tpu.py")


def _inputs(b=2, h=3, l=64, dk=8, dv=16, seed=3, with_mask=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, l, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, dv)).astype(np.float32))
    if with_mask:
        mask = rng.random((b, l)) > 0.3
        mask[:, :8] = True  # at least one valid key per shard
        mask = jnp.asarray(mask)
    else:
        mask = None
    return q, k, v, mask


def _sharded_ring_flash(mesh, temperature=None):
    from csn_tpu.ops.attention import ring_flash_attention

    return jax.shard_map(
        lambda a, b_, c, d: ring_flash_attention(
            a, b_, c, d, axis="seq", temperature=temperature),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, None, "seq", None), P(None, "seq")),
        out_specs=P(None, None, "seq", None), check_vma=False)


@needs_4_devices
def test_ring_flash_matches_dense_and_online():
    """4-hop flash ring == dense full attention == online ring (dropout=0),
    with a nontrivial kv mask traveling the ring."""
    from csn_tpu.ops.attention import (
        ring_attention, scaled_dot_product_attention,
    )

    q, k, v, mask = _inputs()
    mesh = make_midfc_mesh(1, 4)
    with interpret_pallas():
        got = _sharded_ring_flash(mesh)(q, k, v, mask)
    ref = scaled_dot_product_attention(q, k, v, mask)
    # flash kernels use bf16 MXU operands -> bf16 tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)

    online = jax.shard_map(
        lambda a, b_, c, d: ring_attention(a, b_, c, d, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, None, "seq", None), P(None, "seq")),
        out_specs=P(None, None, "seq", None), check_vma=False)(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(online),
                               rtol=2e-2, atol=2e-2)


@needs_4_devices
def test_ring_flash_grads_match_dense():
    """q, k AND v gradients through the flash ring (the k/v cotangents ride
    the ring home through n extra ppermutes): TIGHT parity vs plain
    flash_attention (same kernels, ring-composed) and bf16-level parity vs
    the f32 dense reference (measured: plain flash deviates from dense by
    the same ~1% of grad scale — the ring adds nothing on top)."""
    from csn_tpu.ops.attention import scaled_dot_product_attention
    from csn_tpu.ops.flash import flash_attention

    q, k, v, mask = _inputs(seed=5)
    temp = float(q.shape[-1]) ** 0.5
    mesh = make_midfc_mesh(1, 4)
    fr = _sharded_ring_flash(mesh)

    def loss_ring(q_, k_, v_):
        return (fr(q_, k_, v_, mask) ** 2).sum()

    def loss_flash(q_, k_, v_):
        return (flash_attention(q_, k_, v_, mask,
                                temperature=temp) ** 2).sum()

    def loss_ref(q_, k_, v_):
        return (scaled_dot_product_attention(
            q_, k_, v_, mask, temperature=temp) ** 2).sum()

    # the custom-vjp backward traces during grad evaluation, after the
    # forward returns — the interpret patch must wrap the whole grad call
    with interpret_pallas():
        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_flash):
        # same kernels but different bf16 rounding draws: the ring rounds
        # each hop's p = exp(s - running_max) to bf16 at its own running
        # scale before the p@v matmul, plain flash at the global max scale
        # (a systematic composition bug — double-counted block, wrong hop
        # count — would show as O(1) error, not bf16 noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2,
                                   atol=3e-2)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-2,
                                   atol=8e-2)


@needs_4_devices
def test_ring_flash_single_chip_equals_flash():
    """n=1 ring (no hops) must equal plain flash_attention bit-for-bit-ish:
    same kernels, normalization moved from kernel finalize to XLA."""
    from csn_tpu.ops.flash import flash_attention

    q, k, v, mask = _inputs(b=1, h=2, l=32, seed=7)
    mesh = make_midfc_mesh(1, 1)
    with interpret_pallas():
        got = _sharded_ring_flash(mesh, temperature=2.0)(q, k, v, mask)
        ref = flash_attention(q, k, v, mask, temperature=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@needs_4_devices
def test_ring_flash_model_integration():
    """CrossShapeAt with chunk_size=None + seq sharding + use_flash=True
    routes MultiHeadAttention through ring_flash_attention and still matches
    the single-device dense model (values + grads at dropout=0)."""
    from csn_tpu.midfc.model import get_model
    from csn_tpu.parallel.midfc import make_midfc_steps
    from csn_tpu.train.losses import cross_entropy_positive_labels

    B, Pn, C, NCLS, K = 4, 40, 16, 5, 1
    rng = np.random.default_rng(8)
    feats = rng.normal(size=(B, Pn, C)).astype(np.float32)
    labels = rng.integers(0, NCLS, size=(B, Pn)).astype(np.int32)
    neighbors = rng.normal(size=(B, K + 1, Pn, C)).astype(np.float32)
    neighbors[:, 0] = feats

    dense = get_model("csa", NCLS, n_heads=2, K=K, chunk_size=None,
                      d_model=C, dropout=0.0, use_flash=False)
    variables = dense.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(neighbors), train=False)
    params = variables["params"]
    ref_logits = dense.apply({"params": params}, feats, neighbors,
                             train=False)

    def ref_loss(p):
        logits = dense.apply({"params": p}, feats, neighbors, train=True,
                             rngs={"dropout": jax.random.PRNGKey(7)})
        return cross_entropy_positive_labels(logits, jnp.asarray(labels))

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

    flashm = get_model("csa", NCLS, n_heads=2, K=K, chunk_size=None,
                       d_model=C, dropout=0.0, use_flash=True)
    mesh = make_midfc_mesh(2, 2)
    steps = make_midfc_steps(flashm, "csa", mesh)
    with interpret_pallas():
        got = steps.eval(params, jnp.asarray(feats), jnp.asarray(neighbors))
        loss, grads = steps.grad(params, jnp.asarray(feats),
                                 jnp.asarray(labels), jnp.asarray(neighbors),
                                 jax.random.PRNGKey(7))
        got, loss = np.asarray(got), float(loss)
        grads = jax.tree_util.tree_map(np.asarray, grads)
    np.testing.assert_allclose(got, np.asarray(ref_logits), rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(loss, float(ref_l), rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2,
                                   atol=3e-2)


@needs_4_devices
def test_ring_flash_dropout_seed_keying_fwd_bwd_agree(monkeypatch):
    """The dropout seed contract — every (query chip, origin chip) pair gets
    one distinct seed, the BACKWARD regenerates exactly the forward's seed
    for each block, and per-block dk cotangents land home — proven without
    the TPU PRNG: the flash kernels are replaced by spies that ENCODE
    seed * origin-marker into out / dq / dk while the REAL ring machinery
    (_ring_flash_scan hop order, _ring_flash_bwd re-ring + homing) runs over
    them on the 4-chip mesh. A future edit that desynchronizes the forward's
    per-hop seeds from the backward's regeneration (the biased-gradient
    failure class documented in ops/flash.py) shifts one of these sums and
    fails loudly; the real-kernel dropout determinism lives in the TPU suite."""
    import csn_tpu.ops.flash as F
    from csn_tpu.ops.attention import ring_flash_attention

    n, b, h, lq, dk_d, dv_d, BASE = 4, 1, 2, 2, 2, 3, 7
    L = n * lq

    def fwd_spy(q, k, v, kv_mask, q_mask, carry, temperature,
                dropout=0.0, seed=None, **kw):
        m, l, acc = carry
        return (m, l, acc + seed.astype(jnp.float32) * jnp.mean(k))

    def bwd_spy(q, k, v, kv_mask, out, lse, g, temperature,
                dropout=0.0, seed=None):
        enc = seed.astype(jnp.float32) * jnp.mean(k)
        return (jnp.full(q.shape, enc, jnp.float32),
                jnp.full(k.shape, seed.astype(jnp.float32), jnp.float32),
                jnp.zeros(v.shape, jnp.float32))

    monkeypatch.setattr(F, "flash_forward_carry", fwd_spy)
    monkeypatch.setattr(F, "flash_carry_finalize",
                        lambda c: (c[2], c[0]))
    monkeypatch.setattr(F, "flash_block_backward", bwd_spy)

    # k marker: every row of chip i's shard holds i+1
    q = jnp.zeros((b, h, L, dk_d), jnp.float32)
    k = jnp.repeat(jnp.arange(1, n + 1, dtype=jnp.float32),
                   lq)[None, None, :, None] * jnp.ones((b, h, L, dk_d))
    v = jnp.zeros((b, h, L, dv_d), jnp.float32)

    mesh = make_midfc_mesh(1, n)
    f = jax.shard_map(
        lambda a, b_, c: ring_flash_attention(
            a, b_, c, None, axis="seq", temperature=1.0,
            dropout_rate=0.5, seed=BASE),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None), check_vma=False)
    out, vjp_fn = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp_fn(jnp.ones_like(out))

    # expected keying: seed(me, origin) = BASE*65599 + me*n + origin
    seed_of = lambda me, o: BASE * 65599 + me * n + o
    pairs = [seed_of(me, o) for me in range(n) for o in range(n)]
    assert len(set(pairs)) == n * n  # one distinct seed per (q, origin) pair

    out, dq, dk, dv = map(np.asarray, (out, dq, dk, dv))
    for me in range(n):
        rows = slice(me * lq, (me + 1) * lq)
        # fwd: sum over hops of seed(me, origin) * marker(origin)
        want = sum(seed_of(me, o) * (o + 1) for o in range(n))
        np.testing.assert_allclose(out[:, :, rows], want, rtol=1e-6)
        # bwd regenerates the SAME seeds for the same blocks
        np.testing.assert_allclose(dq[:, :, rows], want, rtol=1e-6)
        # block-origin me's dk came home carrying every chip's contribution
        want_dk = sum(seed_of(src, me) for src in range(n))
        np.testing.assert_allclose(dk[:, :, rows], want_dk, rtol=1e-6)
    np.testing.assert_allclose(dv, 0.0)
