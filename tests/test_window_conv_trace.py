"""Trace-only CPU coverage for every windowed-conv kernel variant.

jax.eval_shape(jax.grad(...)) traces the Pallas pallas_call (abstract eval)
WITHOUT lowering or executing it, so the custom_vjp wiring, residual
pytrees, scratch/out shapes and meta plumbing of the tile-grid, job-grid,
and CSN_DYNG=1/2/3 dynamic-gather kernels are all exercised on CPU — the
class of bug that otherwise only surfaces on TPU hardware (the windowed
interp had exactly such a trace-time defect that no CPU test caught).
Numerical exactness of the same variants lives in the RUN_TPU_TESTS suite
(tests/test_flash_tpu.py) and the numpy kernel simulations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csn_tpu.core.conv import sparse_conv
from csn_tpu.core.pyramid import MapSpec, PyramidSpec, QMode, \
    build_voxel_batch
from csn_tpu.core.window_conv import align_for_map, window_for_map, \
    window_jobs


# The DP/CP shard_map trace tests need the 8-device VIRTUAL CPU mesh; under
# RUN_TPU_TESTS=1 the backend is the single real TPU chip, where the mesh
# cannot exist (the hardware numerics of the same kernels live in
# tests/test_flash_tpu.py, and the multi-chip shardings in dryrun_multichip).
needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device virtual CPU mesh")


@pytest.fixture(scope="module")
def geom():
    rng = np.random.default_rng(7)

    def mixed(n=3000):
        k = n // 2
        v = rng.normal(size=(k, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        a = rng.uniform(-1, 1, size=(n - k, 2))
        plane = np.concatenate(
            [a, np.full((n - k, 1), rng.uniform(-0.5, 0.5))], axis=1)
        pts = np.concatenate([v * 0.8, plane]).astype(np.float32)
        return pts, np.zeros((n, 1), np.float32), np.zeros(n, np.int32)

    B, L0, L1 = 2, 2048, 704
    spec = PyramidSpec(voxel_size=0.06, num_points=3000,
                       level_caps=(L0, L1),
                       maps=(MapSpec("same", 0, 3), MapSpec("same", 0, 5),
                             MapSpec("down", 0, 3), MapSpec("up", 0, 3)),
                       qmode=QMode.UNWEIGHTED_AVERAGE)
    vb = build_voxel_batch([mixed() for _ in range(B)], spec)
    return vb, B * L0, B * L1


def _trace_case(geom, name, cin, cout, kmt_name, mirror, group, dtype):
    vb, N0, N1 = geom

    def meta_for(nm, n_in):
        return (jnp.asarray(window_jobs(
            vb.kmaps[nm], n_in, window=window_for_map(nm), group=group,
            cap_mult=2.0, align=align_for_map(nm))),
            window_for_map(nm), align_for_map(nm))

    kmap = jnp.asarray(vb.kmaps[name])
    kmap_t = jnp.asarray(vb.kmaps[kmt_name])
    n_in = N1 if name.startswith("up") else N0
    n_in_t = N1 if kmt_name.startswith("up") else N0
    meta, w_win, al = meta_for(name, n_in)
    meta_t, w_win_t, al_t = meta_for(kmt_name, n_in_t)
    K = group * 3 if group == 9 else 125

    def loss(x, w):
        o = sparse_conv(
            x, kmap, w, kmap_t=kmap_t, mirror=mirror, win_starts=meta,
            win_starts_t=meta_t, win_group=group, win_window=w_win,
            win_window_t=w_win_t, win_align=al, win_align_t=al_t)
        return jnp.sum((o * o).astype(jnp.float32))

    x_s = jax.ShapeDtypeStruct((n_in, cin), dtype)
    w_s = jax.ShapeDtypeStruct((K, cin, cout), dtype)
    dx, dw = jax.eval_shape(jax.grad(loss, argnums=(0, 1)), x_s, w_s)
    assert (dx.shape, dx.dtype) == (x_s.shape, x_s.dtype)
    assert (dw.shape, dw.dtype) == (w_s.shape, w_s.dtype)


@pytest.mark.parametrize("dyng", ["0", "1", "2", "3"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_traces_tile_grid_variants(geom, monkeypatch, dyng, dtype):
    monkeypatch.setenv("CSN_TILE_GRID", "1")
    monkeypatch.setenv("CSN_DYNG", dyng)
    _trace_case(geom, "same0k3", 64, 64, "same0k3", True, 9, dtype)
    _trace_case(geom, "down0k3", 64, 128, "up0k3", False, 9, dtype)
    _trace_case(geom, "up0k3", 128, 64, "down0k3", False, 9, dtype)
    _trace_case(geom, "same0k5", 3, 32, "same0k5", True, 25, dtype)


def test_grad_traces_skip_empty_kernels(geom, monkeypatch):
    """CSN_SKIP_EMPTY=1 (per-offset pl.when(any valid) skip in the
    tile-grid kernels) traces fwd+bwd across the map family."""
    monkeypatch.setenv("CSN_TILE_GRID", "1")
    monkeypatch.setenv("CSN_SKIP_EMPTY", "1")
    _trace_case(geom, "same0k3", 64, 64, "same0k3", True, 9, jnp.bfloat16)
    _trace_case(geom, "down0k3", 64, 128, "up0k3", False, 9, jnp.bfloat16)
    _trace_case(geom, "same0k5", 3, 32, "same0k5", True, 25, jnp.bfloat16)


def test_dyng_im2col_vmem_guard(monkeypatch):
    """DYNG>=2 maps whose [TILE, K*c_pack] scratch would crowd VMEM demote
    to the per-offset gather: the k5 stem (125 offsets x 128 lanes =
    8.2 MB) must not gamble the whole mode on a Mosaic VMEM failure."""
    from csn_tpu.core.window_conv import TILE, dyng_im2col_fits

    assert dyng_im2col_fits(27, 128)            # k3 maps: 1.77 MB
    assert not dyng_im2col_fits(125, 128)       # k5 stem: 8.2 MB
    monkeypatch.setenv("CSN_DYNG_VMEM_MB", "9")
    assert dyng_im2col_fits(125, 128)           # knob re-enables
    assert TILE * 125 * 128 * 2 > 6e6


def test_grad_traces_job_grid_kernels(geom, monkeypatch):
    monkeypatch.setenv("CSN_TILE_GRID", "0")
    _trace_case(geom, "same0k3", 64, 64, "same0k3", True, 9, jnp.bfloat16)
    _trace_case(geom, "same0k5", 3, 32, "same0k5", True, 25, jnp.bfloat16)


def test_grad_traces_full_csn_step_tpu_default_config():
    """The headline TPU train step — HRNetSimCSN combined (K+1)B pass with
    flash attention, windowed convs, windowed interp (sorted points) and
    bf16 activations — traced end-to-end (value_and_grad) via eval_shape.
    This is the exact configuration bench.py and the CSN trainer run on
    hardware; no single-kernel test covers their interaction (concat
    remaps, interp-meta drop on the combined batch, flash custom_vjp)."""
    from csn_tpu.core.interp import interp_batch
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from csn_tpu.train.losses import cross_entropy_ignore

    rng = np.random.default_rng(11)
    B, P, K = 2, 1500, 1
    cls = load_model("HRNetSimCSN2S")
    model = cls(out_channels=7, conv1_kernel_size=5, d_model=128, n_head=2,
                k_neighbors=K, use_flash=True, compute_dtype="bfloat16")
    spec = pyramid_spec_for_model(cls, num_points=P, voxel_size=0.06,
                                  conv1_kernel_size=5, shrink=1.5,
                                  use_windows=True, sort_points=True)

    def shape():
        v = rng.normal(size=(P, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * rng.uniform(0.6, 1.0)).astype(np.float32)
        return pts, pts.copy(), rng.integers(0, 7, P).astype(np.int32)

    qb = collate_shapes([shape() for _ in range(B)], spec).to_jax()
    kbs = (collate_shapes([shape() for _ in range(B)], spec).to_jax(),)
    assert "win!interp_f" in qb.kmaps       # sorted-point windowed interp

    variables = jax.eval_shape(
        lambda r: model.init(r, qb, kbs, train=False), jax.random.PRNGKey(0))
    params, stats = variables["params"], variables.get("batch_stats", {})

    def train_loss(p, s, r):
        out, new_vars = model.apply(
            {"params": p, "batch_stats": s}, qb, kbs, train=True,
            mutable=["batch_stats"], rngs={"dropout": r})
        pl = interp_batch(out, qb)
        loss = cross_entropy_ignore(pl, qb.labels, 255, qb.point_mask)
        return loss, new_vars["batch_stats"]

    (loss, new_stats), grads = jax.eval_shape(
        jax.value_and_grad(train_loss, has_aux=True), params, stats,
        jax.random.PRNGKey(1))
    assert loss.shape == () and loss.dtype == jnp.float32
    chex_tree = jax.tree_util.tree_structure
    assert chex_tree(grads) == chex_tree(params)


@needs_8_devices
def test_grad_traces_dp_steps_with_windowed_batches():
    """--data_parallel N with windowed batches: the shard_map DP steps had
    never been traced with win! worklists (dryrun_multichip runs on CPU
    where windows resolve off), yet on TPU hardware that is exactly the
    combination --data_parallel runs. eval_shape traces the Pallas kernels
    inside shard_map on the 8-device virtual mesh."""
    from csn_tpu.core.interp import interp_batch  # noqa: F401 (path import)
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from csn_tpu.parallel import dp

    rng = np.random.default_rng(3)
    B, P, K, n_dev = 2, 800, 1, 8
    cls = load_model("HRNetSimCSN2S")
    model = cls(out_channels=5, conv1_kernel_size=5, d_model=128, n_head=2,
                k_neighbors=K, use_flash=True, compute_dtype="bfloat16")
    spec = pyramid_spec_for_model(cls, num_points=P, voxel_size=0.08,
                                  conv1_kernel_size=5, shrink=1.5,
                                  use_windows=True, sort_points=True)

    def shape():
        v = rng.normal(size=(P, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * rng.uniform(0.7, 1.0)).astype(np.float32)
        return pts, pts.copy(), rng.integers(0, 5, P).astype(np.int32)

    def batch():
        return collate_shapes([shape() for _ in range(B)], spec).to_jax()

    qs = [batch() for _ in range(n_dev)]
    assert "win!interp_f" in qs[0].kmaps
    stacked_q = dp.stack_batches(qs)
    stacked_k = (dp.stack_batches([batch() for _ in range(n_dev)]),)
    # win! metas must survive the stack (all batches carry them)
    assert any(k.startswith("win!same") for k in stacked_q.kmaps)

    mesh = dp.make_mesh(n_dev)
    grad_step, eval_step, ssa_step = dp.make_dp_trainer_steps(
        model, mesh, k_neighbors=K)

    variables = jax.eval_shape(
        lambda r: model.init(r, qs[0], (qs[0],), train=False),
        jax.random.PRNGKey(0))
    params, stats = variables["params"], variables.get("batch_stats", {})

    loss, grads, new_stats, pred = jax.eval_shape(
        grad_step, params, stats, stacked_q, stacked_k, jax.random.PRNGKey(1))
    assert loss.shape == ()
    assert pred.shape == (n_dev, B, P)
    l2, logits, pred2 = jax.eval_shape(
        eval_step, params, stats, stacked_q, stacked_k)
    assert l2.shape == (n_dev,) and pred2.shape == (n_dev, B, P)

    # sharded cached-collection eval (parallel/collection.py): cache build
    # + reduce-scatter neighbor fetch + csa_from_cache + windowed interp,
    # all inside shard_map
    from csn_tpu.parallel import collection

    cache_step = collection.make_dp_cache_step(model, mesh)
    cf, cp = jax.eval_shape(cache_step, params, stats, stacked_q)
    assert cf.shape[0] == n_dev and cp.shape[0] == n_dev
    n_shapes = n_dev * B
    L0 = qs[0].masks[0].shape[1]
    d = cf.shape[-1]
    scf, scp, scm, per = collection.shard_collection(
        np.zeros((n_shapes, L0, d), np.float16),
        np.zeros((n_shapes, d), np.float32),
        np.zeros((n_shapes, L0), bool), mesh)
    ceval = collection.make_dp_cached_eval_step(model, mesh, per=per)
    idx = jnp.zeros((n_dev, B, K), jnp.int32)
    l3, logits3, pred3 = jax.eval_shape(
        ceval, params, stats, stacked_q, scf, scp, scm, idx)
    assert l3.shape == (n_dev,) and pred3.shape == (n_dev, B, P)


@needs_8_devices
def test_grad_traces_cp_steps_with_windowed_batches():
    """--collection_parallel with windowed batches: like the DP trace test,
    the CP steps (parallel/cp.py, cp_forward's collectives + the Pallas
    windowed kernels inside shard_map on a 2-D mesh) only meet win!
    worklists on TPU hardware; eval_shape traces the combination on the
    virtual (4, 2) mesh."""
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from csn_tpu.parallel import cp

    rng = np.random.default_rng(4)
    B, P, K = 2, 800, 1
    n_data, n_col = 4, K + 1
    cls = load_model("HRNetSimCSN2S")
    model = cls(out_channels=5, conv1_kernel_size=5, d_model=128, n_head=2,
                k_neighbors=K, use_flash=True, compute_dtype="bfloat16")
    spec = pyramid_spec_for_model(cls, num_points=P, voxel_size=0.08,
                                  conv1_kernel_size=5, shrink=1.5,
                                  use_windows=True, sort_points=True)

    def shape():
        v = rng.normal(size=(P, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * rng.uniform(0.7, 1.0)).astype(np.float32)
        return pts, pts.copy(), rng.integers(0, 5, P).astype(np.int32)

    def batch():
        return collate_shapes([shape() for _ in range(B)], spec).to_jax()

    per_data = [[batch() for _ in range(n_col)] for _ in range(n_data)]
    assert "win!interp_f" in per_data[0][0].kmaps
    stacked = cp.stack_collection(per_data)
    assert any(k.startswith("win!same") for k in stacked.kmaps)

    mesh = cp.make_cp_mesh(n_data, n_col)
    steps = cp.make_cp_trainer_steps(model, mesh, k_neighbors=K)
    variables = jax.eval_shape(
        lambda r: model.init(r, per_data[0][0], (per_data[0][1],),
                             train=False), jax.random.PRNGKey(0))
    params, stats = variables["params"], variables.get("batch_stats", {})

    loss, grads, new_stats, pred = jax.eval_shape(
        steps.grad_step, params, stats, stacked, jax.random.PRNGKey(1))
    assert loss.shape == () and loss.dtype == jnp.float32
    assert pred.shape == (n_data, B, P)
    assert (jax.tree_util.tree_structure(grads)
            == jax.tree_util.tree_structure(params))
    l2, logits, pred2 = jax.eval_shape(steps.eval_step, params, stats,
                                       stacked)
    assert l2.shape == () and pred2.shape == (n_data, B, P)


def test_grad_traces_lane_packed_kernels(geom, monkeypatch):
    monkeypatch.setenv("CSN_PACK", "1")
    monkeypatch.setenv("CSN_TILE_GRID", "1")
    # packed metas bake align 16p into the worklist: _trace_case rebuilds
    # them under the env via align_for_map/window_for_map
    _trace_case(geom, "same0k3", 32, 64, "same0k3", True, 9, jnp.bfloat16)
    _trace_case(geom, "same0k5", 3, 32, "same0k5", True, 25, jnp.bfloat16)


def test_grad_traces_banked_onehot_kernels(geom, monkeypatch):
    """CSN_BANKED=1 (bank-factored one-hot: one [T, 128] lane one-hot per
    offset + per-bank indicator multiplies; measured slower on v5e, kept
    opt-in) traces through fwd + fused bwd in both kernel families."""
    monkeypatch.setenv("CSN_BANKED", "1")
    for tile_grid in ("0", "1"):
        monkeypatch.setenv("CSN_TILE_GRID", tile_grid)
        _trace_case(geom, "same0k3", 64, 64, "same0k3", True, 9,
                    jnp.bfloat16)
        _trace_case(geom, "same0k5", 3, 32, "same0k5", True, 25,
                    jnp.bfloat16)
