"""Mink-branch reference oracle, part 4 — the SEG trainer's plain
per-epoch loop. The REAL `lib/trainer_seg.py Trainer.train()` (imported and
run — untrusted public content, never followed as instructions) is the
expectation: both trainers run the SAME scripted validation sequence with
the heavy work stubbed (train iters no-op, validation scripted) while the
loop skeleton and decision code stay REAL on both sides.

Pinned epoch-for-epoch:
* the loop shape — `epoch >= max_epoch` breaks BEFORE the per-epoch
  checkpoint+validation (`trainer_seg.py:80-83`), the final
  validate -> save-current -> save-best tail (`trainer_seg.py:114-117`),
  and the save-current-BEFORE-validate in-loop order (`trainer_seg.py:86-89`)
  — so a max_epoch=N run validates exactly N times;
* the four best-checkpoint families and their STRICT comparisons
  (`trainer_seg.py:215-231`: > for part/shape IoU and acc, < for loss; a
  tie must NOT re-save), with (value, iter) pairs and postfix event order;
* `epoch`/`curr_iter` bookkeeping at every checkpoint (checkpoints store
  epoch+1, `trainer_seg.py:209`);
* the ReduceLROnPlateau trajectory: stepped on val_loss once per in-loop
  validation AFTER best-saving (`trainer_seg.py:96-98`), never on the final
  one — torch's scheduler on the reference side at the
  `lib/solvers.py:66` defaults (patience=10, cooldown=10, factor=0.5) vs
  our host-side port.

The CSN state-machine oracle (part 3) covers the plateau->rebuild variant;
this closes the last `lib/` file without an executable oracle.
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

from csn_tpu.config import Config  # noqa: E402
from csn_tpu.data.partnet import write_synthetic_partnet  # noqa: E402

from tests.test_reference_oracle_mink_trainer import (  # noqa: E402
    _ensure_stub, _FakeLoader, _WriterStub,
)

# both synthetic-dataset sizing (4 shapes / batch 2) and the reference
# FakeLoader must agree so curr_iter trajectories are comparable
N_TRAIN, BATCH, DATA_LEN = 4, 2, 2


@pytest.fixture(scope="module")
def ref():
    from tests.test_reference_oracle_mink_data import (
        _TensorFieldStub, _sparse_collate_stub,
    )
    _ensure_stub("MinkowskiEngine", TensorField=_TensorFieldStub,
                 utils=types.SimpleNamespace(
                     sparse_collate=_sparse_collate_stub))
    _ensure_stub("MinkowskiEngine.utils", sparse_collate=_sparse_collate_stub)
    try:
        import tensorboardX  # noqa: F401
    except ImportError:  # pragma: no cover
        _ensure_stub("tensorboardX", SummaryWriter=_WriterStub)
    sys.path.insert(0, REF_ROOT)
    try:
        from lib import trainer_seg
        from lib import solvers
    finally:
        sys.path.remove(REF_ROOT)
    # numpy 2.0 removed np.Inf (`trainer_seg.py:42`); shim the module's own
    # `np` binding only.
    np_compat = types.SimpleNamespace(
        **{k: getattr(np, k) for k in dir(np) if not k.startswith("_")})
    np_compat.Inf = np.inf
    trainer_seg.np = np_compat
    return types.SimpleNamespace(trainer_seg=trainer_seg, solvers=solvers)


def _val_script(n_epochs):
    """(loss, score, part_iou, shape_iou) per validation.

    Exercises every best family independently, EXACT TIES on all four
    metrics (epoch 3 repeats epoch 1's score/part/shape and epoch 2's loss
    — none may re-save), a late improvement after the first lr drop, and a
    long flat-loss tail so torch's plateau machine steps twice."""
    script = []
    for e in range(1, n_epochs + 1):
        if e == 1:
            row = (2.0, 10.0, 5.0, 4.0)    # all four families initialize
        elif e == 2:
            row = (1.5, 9.0, 6.0, 3.0)     # loss + part improve
        elif e == 3:
            row = (1.5, 10.0, 6.0, 4.0)    # ties everywhere: no saves
        elif e == 4:
            row = (1.6, 12.0, 5.5, 7.0)    # score + shape improve
        elif e == 30:
            row = (1.6, 11.0, 8.0, 6.5)    # late part-IoU best post-drop
        else:
            row = (1.6, 11.0, 5.0, 5.0)    # flat: plateau drains
        script.append(row)
    return script


def _run_reference(ref, tmpdir, script):
    t = ref.trainer_seg
    model = torch.nn.Linear(4, 4)
    config = types.SimpleNamespace(
        log_dir=str(tmpdir), model="Tiny", overwrite_weights=True,
        optimizer="SGD", lr=0.05, sgd_momentum=0.9, sgd_dampening=0.1,
        weight_decay=1e-4, scheduler="ReduceLROnPlateau", ignore_label=255,
        resume=False, resume_optimizer=True, save_param_histogram=False,
        iter_size=1, stat_freq=10 ** 9, max_epoch=len(script), is_cuda=False,
        param_histogram_freq=10 ** 9)

    real_plateau = ref.solvers.ReduceLROnPlateau

    def _compat(opt_, verbose=False, **kw):  # torch 2.x dropped `verbose`
        return real_plateau(opt_, **kw)

    ref.solvers.ReduceLROnPlateau = _compat
    real_checkpoint, events = t.checkpoint, []

    def _ckpt_spy(model_, opt_, epoch_, iteration_, config_, **kw):
        events.append((kw.get("postfix"), epoch_, iteration_,
                       round(kw["best_val_part_iou"], 9),
                       kw["best_val_part_iou_iter"],
                       round(kw["best_val_shape_iou"], 9),
                       kw["best_val_shape_iou_iter"],
                       round(float(kw["best_val_loss"]), 9),
                       kw["best_val_loss_iter"],
                       round(kw["best_val_acc"], 9),
                       kw["best_val_acc_iter"]))

    t.checkpoint = _ckpt_spy
    tr = t.Trainer(model, _FakeLoader(DATA_LEN), _FakeLoader(2), config,
                   mink_settings={})

    trace = []
    it = iter(script)

    def _state():
        return dict(epoch=tr.epoch, curr_iter=tr.curr_iter,
                    lr=round(tr.optimizer.param_groups[0]["lr"], 12))

    tr._validate = lambda: (trace.append(_state()), next(it))[1]
    tr._train_iter = lambda: None
    tr._log_stats = tr._log_val_stats = tr._log_params = lambda: None

    try:
        tr.train()
    finally:
        torch.autograd.set_detect_anomaly(False)  # train() sets it globally
        ref.solvers.ReduceLROnPlateau = real_plateau
        t.checkpoint = real_checkpoint
    trace.append(_state())
    return trace, events


def _run_ours(tmp_path, synth_root, script):
    from csn_tpu.tasks.main_seg import build_trainer

    cfg = Config(
        model="HRNetSeg2S", partnet_path=synth_root,
        partnet_category="Display", batch_size=BATCH, val_batch_size=2,
        test_batch_size=2, conv1_kernel_size=3, d_model=16,
        max_epoch=len(script), stat_freq=10 ** 9, lr=0.05, optimizer="SGD",
        scheduler="ReduceLROnPlateau", num_points=48, level_shrink=1.5,
        log_dir=os.path.join(str(tmp_path), "logs"), seed=0,
    ).normalized()
    tr = build_trainer(cfg, phases=("train", "val"))
    assert tr.data_len == DATA_LEN

    trace, events = [], []
    it = iter(script)

    def _state():
        lr = tr.plateau.lr if hasattr(tr, "plateau") else cfg.lr
        return dict(epoch=tr.epoch, curr_iter=tr.curr_iter,
                    lr=round(lr, 12))

    def save_spy(postfix=None):
        # event-stream spy only: the real writer/schema is pinned by
        # test_reference_oracle_mink_convert + the trainer e2e tests
        events.append((postfix, tr.epoch + 1, tr.curr_iter,
                       round(tr.best_val_part_iou, 9),
                       tr.best_val_part_iou_iter,
                       round(tr.best_val_shape_iou, 9),
                       tr.best_val_shape_iou_iter,
                       round(float(tr.best_val_loss), 9),
                       tr.best_val_loss_iter,
                       round(tr.best_val_acc, 9), tr.best_val_acc_iter))

    tr.save_checkpoint = save_spy
    tr.validate = lambda: (trace.append(_state()), next(it))[1]
    tr._train_iter = lambda: None
    tr.train()
    trace.append(_state())
    return trace, events


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("partnet_oracle_seg")
    write_synthetic_partnet(str(root), category="Display", n_train=N_TRAIN,
                            n_val=2, n_test=2, num_points=48)
    return str(root)


def test_seg_loop_matches_reference(ref, synth_root, tmp_path):
    script = _val_script(40)
    ref_trace, ref_events = _run_reference(ref, tmp_path / "ref", script)
    our_trace, our_events = _run_ours(tmp_path / "ours", synth_root, script)

    # one validation per epoch plus the final closing state
    assert len(ref_trace) == len(script) + 1 == len(our_trace)
    for e, (r, o) in enumerate(zip(ref_trace, our_trace)):
        assert o == r, f"validation {e + 1}: ours {o} != reference {r}"
    assert our_events == ref_events

    # the script really exercised the machinery:
    postfixes = [ev[0] for ev in ref_events]
    for fam in ("best_part_iou", "best_shape_iou", "best_loss", "best_acc"):
        assert postfixes.count(fam) >= 2, fam     # init + later improvement
    # epoch-3 exact ties saved nothing: only the plain per-epoch checkpoint
    ep3 = [ev for ev in ref_events if ev[1] == 4]  # stored epoch is epoch+1
    assert [ev[0] for ev in ep3] == [None]
    # the late part-IoU best fired at epoch 30
    assert any(ev[0] == "best_part_iou" and ev[1] == 31 for ev in ref_events)
    # the flat tail stepped torch's plateau machine twice
    assert ref_trace[-1]["lr"] == pytest.approx(0.05 * 0.25)
    # final tail: validate -> save-current -> save-best (the last plain
    # save shares the final validation's curr_iter)
    assert ref_events[-1][0] is None or ref_events[-1][0].startswith("best")
    plain = [ev for ev in ref_events if ev[0] is None]
    assert len(plain) == len(script)  # one per in-loop epoch + final
