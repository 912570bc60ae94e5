"""Headline benchmark: CSN (HRNetSimCSN3S, K=1) training throughput on TPU.

Protocol mirrors the reference's flagship config (BASELINE.md): PartNet-style
shapes with 10k points, voxel size 0.05, effective batch 8, SGD — one training
step = forward(query batch + 1 retrieved-key batch) + SSA/CSA attention +
backward + update. Shapes are synthetic surface samples (sphere shells) so
voxel occupancy (~3-4.5k voxels/shape) matches real PartNet scans.

Prints ONE JSON line:
  {"metric": "csn_train_throughput", "value": <queries/sec>,
   "unit": "shapes/sec", "vs_baseline": <value / 10.0>}

vs_baseline: the reference publishes no throughput (BASELINE.md §Throughput).
Baseline estimate: V100 + MinkowskiEngine HRNet3S, effective batch 8, K=1 —
two sparse-HRNet forwards + per-batch-element attention loops + backward;
comparable ME workloads run 0.7-1.0 s/iter on V100, i.e. ~8-11 query
shapes/sec. We use 10.0 shapes/sec as the baseline denominator, so
vs_baseline >= 2.0 meets the >=2x-V100 north star.

FULL AUDIT of this denominator, the infer /3 heuristic, the useful
model-FLOP count (2.813 TF/train step at this protocol) and the resulting
MFU (6.1% of v5e bf16 peak; why that is the measured floor for this
gather-dominated workload): BENCH_AUDIT.md, reproducible via
`python scripts/flop_audit.py`.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from functools import partial

import numpy as np

V100_BASELINE_SHAPES_PER_SEC = 10.0


class _Watchdog:
    """Wall-clock budget for the whole bench run (BENCH_BUDGET_S, default
    480 s — comfortably under the driver's timeout).

    The axon relay has been observed to wedge the first *execution* after a
    successful compile (BENCH_r04: rc=124 after 560 s, compile-cache entry
    written, round-3 bench hangs identically — an environment degradation,
    not a code path). A SIGALRM handler cannot fire while the main thread is
    blocked inside jax's C++ await, so this is a daemon THREAD: on budget
    breach it prints the one JSON line the driver parses — with
    `"value": null` and the stage reached — flushes, and `os._exit(0)`.
    A parsed partial artifact beats rc=124."""

    def __init__(self):
        self.t0 = time.time()
        self.stage = "start"
        self.stage_t0 = self.t0
        self.metric = "csn_train_throughput"
        self.unit = "shapes/sec"
        self.budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
        self._done = threading.Event()
        # serializes the breach print against disarm(): whoever takes the
        # lock first wins, so stdout carries EXACTLY one JSON line even when
        # the run finishes at ~the budget boundary.
        self._lock = threading.Lock()

    def set_metric(self, metric, unit="shapes/sec"):
        self.metric, self.unit = metric, unit

    def set_stage(self, name):
        now = time.time()
        print(f"[bench-wd] stage '{self.stage}' took {now - self.stage_t0:.1f}s"
              f" -> entering '{name}' (elapsed {now - self.t0:.1f}s of "
              f"{self.budget_s:.0f}s budget)", file=sys.stderr, flush=True)
        self.stage, self.stage_t0 = name, now

    def arm(self):
        if self.budget_s <= 0:  # BENCH_BUDGET_S=0 disables the watchdog
            return

        def _watch():
            if not self._done.wait(timeout=self.budget_s):
                with self._lock:
                    if self._done.is_set():
                        return  # disarm won the boundary race — success line
                    self._done.set()
                    now = time.time()
                    print(f"[bench-wd] BUDGET BREACHED after "
                          f"{now - self.t0:.1f}s in stage '{self.stage}' "
                          f"(stage running {now - self.stage_t0:.1f}s) — "
                          f"emitting partial JSON and exiting 0",
                          file=sys.stderr, flush=True)
                    print(json.dumps({
                        "metric": self.metric, "value": None,
                        "unit": self.unit, "vs_baseline": None,
                        "aborted_at": self.stage,
                        "elapsed_s": round(now - self.t0, 1),
                        "stage_elapsed_s": round(now - self.stage_t0, 1),
                    }), flush=True)
                    sys.stdout.flush()
                    sys.stderr.flush()
                    os._exit(0)

        threading.Thread(target=_watch, daemon=True,
                         name="bench-watchdog").start()

    def disarm(self):
        with self._lock:
            self._done.set()


WD = _Watchdog()


def _emit(value, vs_baseline):
    """Print the one driver-parsed JSON line. metric/unit come from WD —
    the single source of truth shared with the breach path — and disarm()
    runs first (lock-serialized against the watchdog), so a budget breach
    can never race a second JSON line onto stdout."""
    WD.disarm()
    print(json.dumps({"metric": WD.metric, "value": value, "unit": WD.unit,
                      "vs_baseline": vs_baseline}), flush=True)


def _setup_compile_cache():
    """Repo-local persistent compilation cache (self-set when unset): repeat
    runs — and a driver retry after a relay wedge — skip the ~2 min compile.
    /tmp does not survive the driver's container churn; the repo dir does."""
    import jax

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(here, ".jaxcache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass


def make_surface_shape(rng, n_points=10000):
    """Points on a few spherical/planar patches -> surface-like occupancy."""
    pts = []
    n_left = n_points
    for _ in range(rng.integers(2, 5)):
        n = min(int(rng.integers(n_points // 4, n_points // 2)), n_left)
        if n <= 0:
            break
        kind = rng.integers(0, 2)
        if kind == 0:  # sphere shell patch
            v = rng.normal(size=(n, 3))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            r = rng.uniform(0.4, 1.0)
            c = rng.uniform(-0.2, 0.2, size=3)
            pts.append(v * r + c)
        else:  # planar patch
            a = rng.uniform(-1, 1, size=(n, 2))
            z = np.full((n, 1), rng.uniform(-0.8, 0.8))
            p = np.concatenate([a, z], axis=1)
            perm = rng.permutation(3)
            pts.append(p[:, perm])
        n_left -= n
    if n_left > 0:
        v = rng.normal(size=(n_left, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts.append(v)
    coords = np.concatenate(pts)[:n_points].astype(np.float32)
    labels = ((coords[:, 0] > 0).astype(np.int32)
              + 2 * (coords[:, 1] > 0).astype(np.int32)) + 1
    return coords, coords.copy(), labels


def write_bench_partnet(root: str, n_train: int = 64, n_val: int = 8,
                        P: int = 10000, seed: int = 0):
    """Synthetic PartNet-format h5 category with bench-realistic occupancy."""
    import h5py

    rng = np.random.default_rng(seed)
    cat = os.path.join(root, "Chair")
    os.makedirs(cat, exist_ok=True)
    for phase, n in (("train", n_train), ("val", n_val), ("test", n_val)):
        data = np.stack([make_surface_shape(rng, P)[0] for _ in range(n)])
        labs = ((data[..., 0] > 0).astype(np.int32)
                + 2 * (data[..., 1] > 0).astype(np.int32)) + 1
        with h5py.File(os.path.join(cat, f"{phase}-00.h5"), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label_seg", data=labs)
        with open(os.path.join(cat, f"{phase}_files.txt"), "w") as f:
            f.write(f"{phase}-00.h5\n")


def run_e2e():
    """Overlapped end-to-end trainer throughput (VERDICT r1 #6): the REAL
    CSNTrainer loop — prefetch thread building (1+K) batches per step on the
    host, device train step — on synthetic PartNet-scale data. Reports
    steady-state shapes/s alongside (not instead of) the device-only
    headline. Run: BENCH_E2E=1 python bench.py"""
    import tempfile

    _setup_compile_cache()
    WD.set_metric("csn_e2e_train_throughput")

    from csn_tpu.config import Config
    from csn_tpu.tasks.main_csn import build_trainer

    B, P, K = 8, 10000, int(os.environ.get("BENCH_K", "1"))
    with tempfile.TemporaryDirectory() as tmp:
        WD.set_stage("host_dataset_build")
        write_bench_partnet(tmp, P=P)
        cfg = Config(
            model="HRNetSimCSN3S", partnet_path=tmp, partnet_category="Chair",
            batch_size=B, test_batch_size=B, k_neighbors=K, max_epoch=1,
            stat_freq=1000, lr=0.05, optimizer="SGD", scheduler="StepLR",
            num_points=P, level0_cap=5632, level_shrink=3.0, seed=0,
            log_dir=os.path.join(tmp, "logs"), normalize_coords=False,
        ).normalized()
        trainer = build_trainer(cfg)
        WD.set_stage("init_and_graph")
        trainer.initialize()
        trainer.construct_shape_graph(recalculate=False)
        WD.set_stage("compile_and_warmup")
        for i in range(3):  # compile + prefetch fill
            t0 = time.time()
            trainer._train_iter()
            print(f"[bench-e2e] warmup iter {i}: {time.time() - t0:.2f}s",
                  file=sys.stderr)
        iters = int(os.environ.get("BENCH_ITERS", "10"))
        WD.set_stage("timing")
        t0 = time.time()
        for _ in range(iters):
            trainer._train_iter()
        dt = (time.time() - t0) / iters
        trainer._close_prefetch()
    throughput = B / dt
    print(f"[bench-e2e] steady-state: {dt * 1e3:.1f} ms/iter "
          f"({throughput:.2f} query shapes/sec incl. host pipeline; K={K}; "
          f"data wait {trainer.data_time_avg.avg * 1e3:.0f} ms/iter)",
          file=sys.stderr)
    _emit(value=round(throughput, 3),
          vs_baseline=round(throughput / V100_BASELINE_SHAPES_PER_SEC, 3))


def run_infer():
    """Inference throughput (the north star names 'shapes/sec train + infer
    per chip', BASELINE.json): forward + voxel->point interpolation + the
    reference's argmax-over-labels-1.. readout (`lib/trainer_csn.py:466`),
    no backward. Run: BENCH_MODE=infer python bench.py.

    vs_baseline: forward-only ME on V100 is ~1/3 of its ~0.8-1.0 s train
    iter -> ~25-35 query shapes/sec; we use 30.0 as the denominator."""
    import jax
    import jax.numpy as jnp

    _setup_compile_cache()
    cached = os.environ.get("BENCH_CACHED", "0") == "1"
    WD.set_metric("csn_cached_infer_throughput" if cached
                  else "csn_infer_throughput")

    from csn_tpu.config import Config
    from csn_tpu.core.interp import interp_batch
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model

    B, P, VOXEL = 8, 10000, 0.05
    K = int(os.environ.get("BENCH_K", "1"))
    NUM_CLASSES = 39
    rng = np.random.default_rng(0)
    WD.set_stage("host_batch_build")
    cls = load_model("HRNetSimCSN3S")
    amp = os.environ.get("BENCH_DTYPE", Config().resolved_compute_dtype())
    model = cls(out_channels=NUM_CLASSES, conv1_kernel_size=5, d_model=256,
                n_head=4, k_neighbors=K,
                use_flash=os.environ.get("BENCH_FLASH", "1") == "1",
                compute_dtype=amp)
    spec = pyramid_spec_for_model(
        cls, num_points=P, voxel_size=VOXEL, conv1_kernel_size=5,
        level0_cap=5632, shrink=3.0,
        use_windows=os.environ.get("BENCH_WINDOWS", "1") == "1",
        dense_stem_grid=(None if os.environ.get("BENCH_DENSE_STEM",
                                                "0") == "1" else 0))
    qb = collate_shapes([make_surface_shape(rng, P) for _ in range(B)],
                        spec, rng=rng).to_jax()
    kbs = tuple(collate_shapes([make_surface_shape(rng, P)
                                for _ in range(B)], spec, rng=rng).to_jax()
                for _ in range(K))
    WD.set_stage("model_init")
    variables = jax.jit(
        lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), qb, kbs)

    # BENCH_CACHED=1: the `--cached_eval` forward — neighbor K/V from the
    # precomputed collection cache (csa_from_cache), single-B backbone pass
    # instead of (K+1)-B. Cache build cost is amortized over the whole query
    # split in real eval, so steady-state ms/step is the honest comparison.
    if cached:
        cache_fn = jax.jit(
            lambda v, b: model.apply(v, b, method="cache_features"))
        t0 = time.time()
        cf = [jax.tree_util.tree_map(np.asarray, cache_fn(variables, kb))
              for kb in kbs]
        print(f"[bench-infer] cache build ({K} key batches): "
              f"{time.time() - t0:.1f}s (incl. compile)", file=sys.stderr)
        key_args = (jnp.stack([jnp.asarray(c[0]) for c in cf], 1),
                    jnp.stack([jnp.asarray(c[1]) for c in cf], 1),
                    jnp.stack([kb.masks[0] for kb in kbs], 1))

        def forward(variables, qb, keys):
            return model.apply(variables, qb, *keys,
                               method="csa_from_cache")
    else:
        key_args = kbs

        def forward(variables, qb, keys):
            return model.apply(variables, qb, keys, train=False)

    @jax.jit
    def infer_step(variables, qb, kbs, eps):
        out = forward(variables, qb, kbs)
        pl = interp_batch(out, qb)
        # label 0 is never predicted (`lib/trainer_csn.py:466`)
        pred = jnp.argmax(pl[..., 1:] + eps, axis=-1) + 1
        return pred.sum().astype(jnp.float32)

    # Timing methodology forced by the axon relay: per-iter
    # block_until_ready both LIES for pipelined executions (sub-ms
    # "steady states" observed even with fresh random inputs) and, when
    # honest, adds a tunnel sync round-trip per iter. So measure a CHAIN —
    # each step's eps carries a term from the previous step's output,
    # making the sequence un-memoizable and strictly ordered — and fetch
    # one scalar at the end. The carried term (~1e-14) rounds away in f32,
    # leaving each step's computation identical.
    acc = None

    def chain(n):
        nonlocal acc
        t0 = time.time()
        for _ in range(n):
            e = jnp.float32(rng.uniform(1e-6, 2e-6))
            acc = infer_step(variables, qb, key_args,
                             e + acc * jnp.float32(1e-20))
        float(np.asarray(acc))  # forces the whole chain
        return (time.time() - t0) / n

    WD.set_stage("compile_and_first_step")
    t0 = time.time()
    acc = infer_step(variables, qb, key_args, jnp.float32(1e-6))
    float(np.asarray(acc))
    print(f"[bench-infer] compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr)
    WD.set_stage("warmup")
    print(f"[bench-infer] warmup chain: {chain(3) * 1e3:.1f} ms/step",
          file=sys.stderr)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    WD.set_stage("timing")
    dt = chain(iters)
    throughput = B / dt
    print(f"[bench-infer] steady-state: {dt * 1e3:.1f} ms/step "
          f"({throughput:.2f} query shapes/sec; K={K})", file=sys.stderr)
    _emit(value=round(throughput, 3),
          vs_baseline=round(throughput / 30.0, 3))


def main():
    import jax

    _setup_compile_cache()
    WD.set_metric("csn_train_throughput")

    from csn_tpu.core.interp import interp_batch
    from csn_tpu.data.pipeline import collate_shapes, pyramid_spec_for_model
    from csn_tpu.models import load_model
    from csn_tpu.train.losses import cross_entropy_ignore
    from csn_tpu.train.optim import make_optimizer

    # BENCH_B: batch-scaling A/B (protocol default 8; 16*5632 stays
    # 256-aligned so the windowed kernels survive the combined pass)
    B = int(os.environ.get("BENCH_B", "8"))
    P, VOXEL = 10000, 0.05
    K = int(os.environ.get("BENCH_K", "1"))
    NUM_CLASSES = 39  # Chair
    rng = np.random.default_rng(0)

    cls = load_model("HRNetSimCSN3S")
    use_flash = os.environ.get("BENCH_FLASH", "1") == "1"
    # activation dtype: default mirrors Config.compute_dtype='auto'
    # (bf16 on TPU, f32 elsewhere; BENCH_DTYPE=float32 measures f32: 277 ms)
    from csn_tpu.config import Config

    amp = os.environ.get("BENCH_DTYPE",
                         Config().resolved_compute_dtype())
    model = cls(out_channels=NUM_CLASSES, conv1_kernel_size=5, d_model=256,
                n_head=4, k_neighbors=K, use_flash=use_flash,
                compute_dtype=amp)
    # worklist windowed convs (core/window_conv.py): default ON — the
    # job worklist adapts to any geometry (BENCH_WINDOWS=0 for the
    # XLA-gather baseline)
    use_windows = os.environ.get("BENCH_WINDOWS", "1") == "1"
    # level0 cap 5632: smallest cap with zero voxel truncation for this
    # fixed-seed batch (a 5120 cap silently drops ~1% of voxels)
    spec = pyramid_spec_for_model(
        cls, num_points=P, voxel_size=VOXEL, conv1_kernel_size=5,
        level0_cap=5632, shrink=3.0, use_windows=use_windows,
        dense_stem_grid=(None if os.environ.get("BENCH_DENSE_STEM",
                                                "0") == "1" else 0))

    WD.set_stage("host_batch_build")
    t0 = time.time()
    qb_host = collate_shapes([make_surface_shape(rng, P) for _ in range(B)],
                             spec, rng=rng)
    kb_hosts = [collate_shapes([make_surface_shape(rng, P)
                                for _ in range(B)], spec, rng=rng)
                for _ in range(max(K, 1))]
    kb_host = kb_hosts[0]
    host_build_s = time.time() - t0
    occ = [int(n) for n in qb_host.num_voxels[0]]
    print(f"[bench] host batch build: {host_build_s:.2f}s for 2x{B} shapes; "
          f"voxels/shape: min={min(occ)} max={max(occ)}", file=sys.stderr)

    WD.set_stage("transfer")
    compact = os.environ.get("BENCH_COMPACT_WIRE", "1") == "1"
    qb = qb_host.to_jax(compact=compact)
    kbs = tuple(k.to_jax(compact=compact) for k in kb_hosts[:K])

    def tree_bytes(t):
        return sum(int(x.nbytes) for x in jax.tree_util.tree_leaves(t))

    wire_mb = (tree_bytes(qb) + tree_bytes(kbs)) / 1e6
    print(f"[bench] host->device wire bytes/batch: {wire_mb:.1f} MB "
          f"(compact={compact}; BENCH_COMPACT_WIRE=0 for the int32/full "
          f"layout)", file=sys.stderr)

    WD.set_stage("model_init")
    variables = jax.jit(
        lambda r, b, ks: model.init(r, b, ks, train=False))(
        jax.random.PRNGKey(0), qb, kbs)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    optimizer = make_optimizer(optimizer="SGD", lr=0.05)
    opt_state = optimizer.init(params)

    # params/stats/opt_state are dead after each call (rebound to the
    # returns), so donate them: XLA aliases the update in place instead of
    # holding both generations live (A/B knob: BENCH_DONATE=0).
    donate = (0, 1, 2) if os.environ.get("BENCH_DONATE", "1") == "1" else ()

    @partial(jax.jit, donate_argnums=donate)
    def train_step(params, stats, opt_state, qb, kbs, rng):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": stats}, qb, kbs, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            pl = interp_batch(out, qb)
            loss = cross_entropy_ignore(pl, qb.labels, 255, qb.point_mask)
            return loss, new_vars["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        return new_params, new_stats, new_opt, loss

    key = jax.random.PRNGKey(1)
    WD.set_stage("compile_and_first_step")
    t0 = time.time()
    params, stats, opt_state, loss = train_step(params, stats, opt_state, qb,
                                                kbs, key)
    loss.block_until_ready()
    print(f"[bench] compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(loss):.3f}", file=sys.stderr)

    WD.set_stage("warmup")
    for i in range(2):  # warmup
        t1 = time.time()
        key, sub = jax.random.split(key)
        params, stats, opt_state, loss = train_step(params, stats, opt_state,
                                                    qb, kbs, sub)
        loss.block_until_ready()
        print(f"[bench] warmup step {i}: {time.time() - t1:.2f}s",
              file=sys.stderr)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    trace_dir = os.environ.get("BENCH_TRACE", "")
    if trace_dir:  # profile 3 steps (parse with scripts/trace_budget.py)
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = train_step(
                params, stats, opt_state, qb, kbs, sub)
        loss.block_until_ready()
        jax.profiler.stop_trace()
        print(f"[bench] trace written to {trace_dir}", file=sys.stderr)
    WD.set_stage("timing")
    t0 = time.time()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, stats, opt_state, loss = train_step(params, stats, opt_state,
                                                    qb, kbs, sub)
    loss.block_until_ready()
    dt = (time.time() - t0) / iters
    throughput = B / dt
    print(f"[bench] steady-state: {dt * 1e3:.1f} ms/step "
          f"({throughput:.2f} query shapes/sec; K={K}; B={B})",
          file=sys.stderr)
    try:  # observability: donation's HBM claim, measurable per run
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"[bench] peak HBM in use: {peak / 2 ** 30:.2f} GiB",
                  file=sys.stderr)
    except Exception:
        pass

    _emit(value=round(throughput, 3),
          vs_baseline=round(throughput / V100_BASELINE_SHAPES_PER_SEC, 3))


def run_midfc():
    """MID-FC branch throughput: the CSA training step (grad + Adam apply)
    at the reference's pretrained-model protocol — n_heads=8, K=4, 10000
    points, d_model=256, 500-point chunked attention, Adam(0.5, 0.999)
    (`MID-FC/README.md:86`, `csa_models.py:81-125`, `csa_training.py`).
    Features are synthetic stand-ins for the fc_1 256-d per-point maps.
    Run: BENCH_MODE=midfc python bench.py. BENCH_MIDFC_FLASH=1 swaps the
    parity-exact chunked MHA for the flash kernel (full attention — an
    upgrade, not the reference semantics, so off by default).

    vs_baseline: the reference publishes no MID-FC throughput, so the
    denominator is FLOP-derived. The reference MHA uses d_k=d_v=256 PER
    HEAD x 8 heads (`csa_models.py:147`): projections 256->2048 (~168 GF
    fwd at B=4 incl. output proj), scores+AV 160 (chunk,head) pairs x
    512 MF (~82 GF) => ~250 GF per MHA forward; the REFERENCE runs
    2K+2 = 10 MHA calls/CSA step at K=4 (query SSA + K neighbor SSAs +
    a RECOMPUTED self pass + K cross — `csa_models.py:209/:232`) x3 for
    fwd+bwd = ~8 TF per B=4 step. (Ours runs 9: the self pass reuses the
    query SSA — eval-identical, measured 191.6 -> 175.8 ms/step.) V100 fp32 peak 15.7 TFLOPs => >= 0.5 s/step at
    PERFECT efficiency, i.e. <= 8 shapes/s; with the reference's
    20-iteration python chunk loop per MHA, ~5 shapes/s is a generous
    estimate. We use 5.0. (Our 228 ms/step = ~70% of the v5e f32
    roofline for the same 8 TF.)"""
    import jax
    import jax.numpy as jnp

    _setup_compile_cache()
    WD.set_metric("midfc_csa_train_throughput")

    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner

    B = int(os.environ.get("BENCH_MIDFC_B", "4"))
    P, C, K = 10000, 256, 4
    # BENCH_MIDFC_FLASH: '' (shipped default: flash-on-chunks on TPU),
    # '0' dense, '1' flash, 'full' flash + chunk_size=None (full attention
    # over 10000 pts — a semantics upgrade, far more FLOPs, not a perf knob)
    fl = os.environ.get("BENCH_MIDFC_FLASH", "")
    use_flash = {"": "auto", "0": False, "1": True, "full": True}[fl]
    cfg = MidfcConfig(num_classes=39, n_heads=8, K=K, batch_size=B,
                      chunk_size=None if fl == "full" else 500,
                      use_flash=use_flash, num_points=P, seed=0,
                      compute_dtype=os.environ.get(
                          "BENCH_MIDFC_DTYPE",
                          MidfcConfig.compute_dtype))  # shipped default
    WD.set_stage("host_batch_build")
    runner = MidfcRunner(cfg, "csa")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    neighbors = jnp.asarray(
        rng.normal(size=(B, K + 1, P, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 39, size=(B, P)).astype(np.int32))
    WD.set_stage("model_init")
    runner.initialize(feats, neighbors)

    WD.set_stage("compile_and_first_step")
    t0 = time.time()
    rng_key = jax.random.PRNGKey(0)

    def step():
        nonlocal rng_key
        rng_key, sub = jax.random.split(rng_key)
        loss, grads = runner._grad(runner.params, feats, labels, neighbors,
                                   sub)
        runner.params, runner.opt_state = runner._apply(
            runner.params, runner.opt_state, grads)
        return loss

    loss = step()
    float(np.asarray(loss))
    print(f"[bench-midfc] compile+first: {time.time() - t0:.1f}s "
          f"loss={float(np.asarray(loss)):.3f}", file=sys.stderr)
    # params evolve every step, so the chain is inherently un-memoizable
    # through the relay; fetch one loss at the end to force it.
    WD.set_stage("warmup")
    for w in range(2):
        t0 = time.time()
        loss = step()
        float(np.asarray(loss))
        print(f"[bench-midfc] warmup step {w}: {time.time() - t0:.2f}s",
              file=sys.stderr)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    WD.set_stage("timing")
    t0 = time.time()
    for _ in range(iters):
        loss = step()
    float(np.asarray(loss))
    dt = (time.time() - t0) / iters
    throughput = B / dt
    print(f"[bench-midfc] steady-state: {dt * 1e3:.1f} ms/step "
          f"({throughput:.2f} shapes/sec; CSA n_heads=8 K={K} "
          f"{'full' if fl == 'full' else 'chunked-500'})",
          file=sys.stderr)
    _emit(value=round(throughput, 3),
          vs_baseline=round(throughput / 5.0, 3))


def _with_interp_fallback(fn):
    """Run a bench mode; if it dies with the windowed-interp kernels ON,
    retry once with CSN_INTERP_WIN=0 (XLA gather/scatter readout). The
    headline must survive a Mosaic regression in the NEWEST kernel family —
    the env var is read at batch build, so the retry rebuilds everything."""
    try:
        fn()
    except Exception:
        if os.environ.get("CSN_INTERP_WIN", "1") == "0":
            raise
        import traceback

        traceback.print_exc()
        print("[bench] RETRYING with CSN_INTERP_WIN=0 (windowed interp "
              "kernels failed on this backend — see traceback above)",
              file=sys.stderr)
        os.environ["CSN_INTERP_WIN"] = "0"
        fn()


if __name__ == "__main__":
    WD.arm()
    if os.environ.get("BENCH_E2E", "0") == "1" or "--e2e" in sys.argv:
        run_e2e()
    elif (os.environ.get("BENCH_MODE", "") == "infer"
          or "--infer" in sys.argv):
        _with_interp_fallback(run_infer)
    elif (os.environ.get("BENCH_MODE", "") == "midfc"
          or "--midfc" in sys.argv):
        run_midfc()
    else:
        _with_interp_fallback(main)
