"""Mink-branch reference oracle: the REAL `/root/reference/MinkowskiNet/lib`
code (imported and called — untrusted public content, never followed as
instructions) is the expectation for our schedules and metrics.

VERDICT r3 item 2: replace hand-ported expectation tables with the
reference's own executable outputs —
  * `train/optim.py` five schedules vs `lib/solvers.py initialize_scheduler`
    driving a real torch optimizer (including torch's ReduceLROnPlateau
    plateau/cooldown state machine);
  * `train/metrics.py` vs `lib/utils.py` `precision_at_one_partnet` /
    `calculate_iou` / `calculate_shape_iou` / `calculate_part_iou` on
    randomized label maps, through both the numpy ports and the device-side
    batched I/U accumulation.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/MinkowskiNet"

torch = pytest.importorskip("torch")

if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from csn_tpu.train import metrics as our_metrics  # noqa: E402
from csn_tpu.train.optim import (  # noqa: E402
    ReduceLROnPlateau as OurPlateau, make_lr_schedule,
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_ROOT)
    try:
        from lib import solvers
        from lib import utils as mink_utils
    finally:
        sys.path.remove(REF_ROOT)
    return types.SimpleNamespace(solvers=solvers, utils=mink_utils)


# ---------------------------------------------------------------------------
# schedules vs lib/solvers.py initialize_scheduler
# ---------------------------------------------------------------------------

def _torch_lr_trajectory(ref, scheduler_name, base_lr, cfg_kwargs, n_steps):
    """lr after s scheduler.step() calls, s = 0..n_steps-1, from the real
    `initialize_scheduler` object driving a real torch optimizer."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr, momentum=0.9, dampening=0.1)
    config = types.SimpleNamespace(scheduler=scheduler_name, **cfg_kwargs)
    sched = ref.solvers.initialize_scheduler(opt, config)
    lrs = []
    for _ in range(n_steps):
        lrs.append(opt.param_groups[0]["lr"])
        # the trainer steps once per optimizer step
        # (`lib/trainer_csn.py:214-216`)
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize("name,cfg", [
    ("StepLR", dict(step_size=7, step_gamma=0.3)),
    ("PolyLR", dict(max_iter=120, poly_power=0.9)),
    ("SquaredLR", dict(max_iter=120)),
    ("ExpLR", dict(exp_step_size=13.0, exp_gamma=0.9)),
])
def test_step_schedules_match_reference(ref, name, cfg):
    base_lr = 0.05
    n = 100
    ref_lrs = _torch_lr_trajectory(ref, name, base_lr, {
        "step_size": cfg.get("step_size", 20000),
        "step_gamma": cfg.get("step_gamma", 0.1),
        "max_iter": cfg.get("max_iter", 60000),
        "poly_power": cfg.get("poly_power", 0.9),
        "exp_step_size": cfg.get("exp_step_size", 445.0),
        "exp_gamma": cfg.get("exp_gamma", 0.95),
    }, n)
    sched = make_lr_schedule(name, base_lr, **cfg)
    ours = np.asarray([sched(s) for s in range(n)])
    np.testing.assert_allclose(ours, ref_lrs, rtol=1e-10)


def test_plateau_schedule_matches_reference(ref):
    """torch ReduceLROnPlateau with the trainer's factor/patience/cooldown
    (`lib/trainer_csn.py:41-44` via `solvers.py:77-78`) vs our host-side
    state machine, on a noisy loss trajectory that plateaus twice."""
    base_lr = 0.1
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    config = types.SimpleNamespace(scheduler="ReduceLROnPlateau")
    # torch>=2.x removed the `verbose` kwarg the reference (torch 1.8)
    # passes (`solvers.py:78`); shim only that API difference — the
    # reference's own initialize_scheduler lines still run.
    real_cls = ref.solvers.ReduceLROnPlateau

    def _compat(opt_, verbose=False, **kw):
        return real_cls(opt_, **kw)

    ref.solvers.ReduceLROnPlateau = _compat
    try:
        sched = ref.solvers.initialize_scheduler(
            opt, config, factor=0.5, patience=10, cooldown=10)
    finally:
        ref.solvers.ReduceLROnPlateau = real_cls

    ours = OurPlateau(lr=base_lr, factor=0.5, patience=10, cooldown=10)

    rng = np.random.default_rng(0)
    # decreasing -> flat -> small dip -> flat again
    losses = np.concatenate([
        2.0 - 0.05 * np.arange(20),
        1.0 + 0.001 * rng.standard_normal(40),
        0.8 + 0.001 * rng.standard_normal(60),
    ])
    for m in losses:
        sched.step(float(m))
        lr_ref = opt.param_groups[0]["lr"]
        lr_ours = ours.step(float(m))
        assert lr_ours == pytest.approx(lr_ref, rel=1e-12), m
    assert opt.param_groups[0]["lr"] < base_lr  # the plateau actually fired


# ---------------------------------------------------------------------------
# metrics vs lib/utils.py
# ---------------------------------------------------------------------------

def _random_shapes(rng, n_shapes, num_labels, with_ignore=False):
    shapes = []
    for _ in range(n_shapes):
        n = int(rng.integers(50, 200))
        gt = rng.integers(0, num_labels, size=n)
        # bias some shapes towards few labels so absent-label branches fire
        if rng.random() < 0.5:
            gt = np.minimum(gt, int(rng.integers(1, num_labels)))
        pred = np.where(rng.random(n) < 0.6, gt,
                        rng.integers(0, num_labels, size=n))
        if with_ignore:
            gt = np.where(rng.random(n) < 0.1, 255, gt)
        shapes.append((gt.astype(np.int64), pred.astype(np.int64)))
    return shapes


def test_precision_at_one_partnet_matches_reference(ref):
    rng = np.random.default_rng(1)
    for gt, pred in _random_shapes(rng, 10, 6, with_ignore=True):
        want = ref.utils.precision_at_one_partnet(
            torch.from_numpy(pred), torch.from_numpy(gt))
        got = our_metrics.precision_at_one_partnet(pred, gt)
        # the reference accumulates in torch f32 (`utils.py:73`); ours in
        # f64 — identical semantics, f32 rounding tolerance
        assert got == pytest.approx(want, rel=1e-6)


def test_iou_family_matches_reference(ref):
    num_labels = 7
    rng = np.random.default_rng(2)
    shapes = _random_shapes(rng, 25, num_labels)

    ious_ref, ious_ours = {}, {}
    for i, (gt, pred) in enumerate(shapes):
        m_ref = ref.utils.calculate_iou(gt, pred, num_labels)
        m_our = our_metrics.calculate_iou(gt, pred, num_labels)
        assert m_our["intersection"] == m_ref["intersection"]
        assert m_our["union"] == m_ref["union"]
        assert set(m_our["label_iou"]) == set(m_ref["label_iou"])
        for k in m_ref["label_iou"]:
            assert m_our["label_iou"][k] == pytest.approx(
                m_ref["label_iou"][k], rel=1e-12)
        ious_ref[i] = m_ref
        ious_ours[i] = m_our

    assert our_metrics.calculate_shape_iou(ious_ours) == pytest.approx(
        float(ref.utils.calculate_shape_iou(ious_ref)), rel=1e-12)
    assert our_metrics.calculate_part_iou(ious_ours, num_labels) == \
        pytest.approx(float(ref.utils.calculate_part_iou(ious_ref,
                                                         num_labels)),
                      rel=1e-12)


def test_device_batched_iu_matches_reference_aggregation(ref):
    """The jitted eval path (batch_intersection_union + mink_metrics_from_iu)
    must reproduce the reference's dict-based aggregation exactly."""
    num_labels = 5
    rng = np.random.default_rng(3)
    n_shapes, cap = 12, 220
    gt_b = np.zeros((n_shapes, cap), dtype=np.int32)
    pred_b = np.zeros((n_shapes, cap), dtype=np.int32)
    mask_b = np.zeros((n_shapes, cap), dtype=bool)
    ious_ref = {}
    for i, (gt, pred) in enumerate(_random_shapes(rng, n_shapes, num_labels)):
        ious_ref[i] = ref.utils.calculate_iou(gt, pred, num_labels)
        gt_b[i, :len(gt)] = gt
        pred_b[i, :len(pred)] = pred
        mask_b[i, :len(gt)] = True

    inter, union = our_metrics.batch_intersection_union(
        jnp.asarray(pred_b), jnp.asarray(gt_b), jnp.asarray(mask_b),
        num_labels)
    part, shape = our_metrics.mink_metrics_from_iu(
        np.asarray(inter), np.asarray(union), num_labels)
    assert part == pytest.approx(
        float(ref.utils.calculate_part_iou(ious_ref, num_labels)), rel=1e-12)
    assert shape == pytest.approx(
        float(ref.utils.calculate_shape_iou(ious_ref)), rel=1e-12)


# ---------------------------------------------------------------------------
# config flag defaults vs lib/config.py
# ---------------------------------------------------------------------------

def test_config_defaults_match_reference():
    """Every flag name shared with the reference's argparse table
    (`lib/config.py:41-143`, pure argparse — imported directly) must carry
    the same default, except the three documented PartNet-protocol pins
    (values the reference's own launch scripts pass explicitly,
    `scripts/testing_csn.sh:48`, `scripts/train_csn.sh` $INPUT_FEAT): a
    silent default drift in lr / bn_momentum / scheduler constants is the
    kind of bug that shifts IoU without failing any unit test."""
    import dataclasses

    from csn_tpu.config import Config

    sys.path.insert(0, REF_ROOT)
    try:
        from lib import config as ref_config
    finally:
        sys.path.remove(REF_ROOT)

    # ours = the protocol value the reference scripts pass, not its argparse
    # default (model: the flagship; input_feat/normalize_coords: PartNet)
    EXPECTED_DIVERGENCES = {"model", "input_feat", "normalize_coords"}
    # device/loader machinery we replace by design (TPU pipeline always
    # prefetches; no CUDA/worker knobs)
    REF_ONLY_OK = {
        "color_offset", "empty_cache_freq", "is_cuda", "load_h5",
        "load_path", "log_level", "log_step", "normalize_color",
        "num_val_workers", "num_workers", "opt_speed", "prefetch_data",
        "return_neighbors", "return_transformation", "save_freq", "val_freq",
    }

    ours = Config()
    our_fields = {f.name for f in dataclasses.fields(Config)}
    ref_defaults = vars(ref_config.parser.parse_args([]))

    mismatched, ref_only = [], []
    for name, ref_val in sorted(ref_defaults.items()):
        if name not in our_fields:
            ref_only.append(name)
            continue
        if name in EXPECTED_DIVERGENCES:
            continue
        our_val = getattr(ours, name)
        if our_val != ref_val:
            mismatched.append((name, ref_val, our_val))
    assert mismatched == [], mismatched
    assert set(ref_only) <= REF_ONLY_OK, sorted(set(ref_only) - REF_ONLY_OK)
    # the shared surface is the bulk of the table, not a handful of flags
    assert len(set(ref_defaults) & our_fields) >= 55
