"""Mink-branch reference oracle, part 3 — the CSN trainer's
plateau -> reload-best -> rebuild-graph state machine. The REAL
`lib/trainer_csn.py Trainer.train()` loop (imported and run — untrusted
public content, never followed as instructions) is the expectation: both
trainers are driven through the SAME scripted validation-metric sequence at
the shipped 10/5/3 constants, with heavy work stubbed (train iters no-op,
validation scripted) but the decision machinery REAL on both sides —
patience/cooldown bookkeeping (`trainer_csn.py:115-130`), best-checkpoint
updates, the reload-best + rebuild + counter-reset block
(`trainer_csn.py:136-158` incl. a genuine torch.load of the best-part-IoU
checkpoint the run itself wrote), the MAX_GRAPH_CONSTRUCTION cap, and the
ReduceLROnPlateau lr trajectory (torch's scheduler on the reference side,
our host-side port on ours).

Asserted epoch-for-epoch: (patience, cooldown, n_graph_construction, lr,
best_val_part_iou) at every validation boundary plus the
construct/recalculate event stream. A misreading of the state machine —
decrement order, the cooldown clamp, the elif guard that stops draining
patience at the construction cap, when the reload fires relative to
best-checkpoint saving — fails this test; our previous tests validated the
machine only against a hand-read of the same lines.
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


# ---------------------------------------------------------------------------
# reference import (ME + tensorboardX stubs)
# ---------------------------------------------------------------------------

def _ensure_stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _WriterStub:
    def __init__(self, *a, **k):
        pass

    def add_scalar(self, *a, **k):
        pass

    def add_histogram(self, *a, **k):
        pass

    def add_mesh(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def ref():
    # install the FUNCTIONAL ME stub (shared with the data-path oracle) so
    # module run order cannot leave a broken stub behind for those tests
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
    old_err = np.geterr()
    sys.path.insert(0, REF_ROOT)
    try:
        from lib import trainer_csn
        from lib import solvers
    finally:
        sys.path.remove(REF_ROOT)
        np.seterr(**old_err)
    # numpy 2.0 removed the np.Inf alias `trainer_csn.py:49` evaluates at
    # Trainer construction; point the module's own `np` binding at a shimmed
    # namespace so the global numpy module stays untouched.
    np_compat = types.SimpleNamespace(**{"Inf": np.inf})
    np_compat.__dict__.update(
        {k: getattr(np, k) for k in dir(np) if not k.startswith("_")})
    np_compat.Inf = np.inf
    trainer_csn.np = np_compat
    return types.SimpleNamespace(trainer_csn=trainer_csn, solvers=solvers)


class _FakeLoader:
    """The only data_loader surface train() touches once _train_iter is
    stubbed: __len__, __iter__, .dataset.neighbors."""

    def __init__(self, n=4):
        self.n = n
        self.dataset = types.SimpleNamespace(neighbors=[])

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(())


def _val_script(n_epochs):
    """(loss, score, part_iou, shape_iou) per validation. Exercises:
    improvements (patience resets), stagnation through the cooldown window
    ('getting hotter'), the patience drain, two plateau rebuilds, an
    improvement between them, and the MAX_GRAPH_CONSTRUCTION cap (after the
    construction counter hits 3, patience stops draining even though the
    metric stays flat). Loss decreases at improvements and is flat otherwise
    so the torch ReduceLROnPlateau trajectory is exercised too."""
    script = []
    part = 0.0
    for e in range(1, n_epochs + 1):
        if e <= 3:
            part = 0.1 * e            # early improvements
        elif e == 22:
            part = 0.35               # one bump after the first rebuild
        else:
            part = min(part, 0.30)    # flat otherwise (never a new best)
        loss = max(2.0 - 0.1 * e, 0.5)
        script.append((loss, 50.0, part, part * 0.9))
    return script


def _run_reference(ref, tmpdir, script, k_neighbors=1):
    t = ref.trainer_csn
    model = torch.nn.Linear(4, 4)
    config = types.SimpleNamespace(
        log_dir=str(tmpdir), model="Tiny", overwrite_weights=True,
        optimizer="SGD", lr=0.05, sgd_momentum=0.9, sgd_dampening=0.1,
        weight_decay=1e-4, scheduler="ReduceLROnPlateau", ignore_label=255,
        resume=False, resume_optimizer=True, save_param_histogram=False,
        k_neighbors=k_neighbors, iter_size=1, stat_freq=10 ** 9,
        max_epoch=len(script), is_cuda=False, param_histogram_freq=10 ** 9)

    # torch>=2.x removed ReduceLROnPlateau's `verbose` kwarg the reference
    # (torch 1.8) passes; shim only that API difference — active for the
    # whole run because the reload block re-creates the scheduler mid-train
    # (`trainer_csn.py:147-148`).
    real_plateau = ref.solvers.ReduceLROnPlateau

    def _compat(opt_, verbose=False, **kw):
        return real_plateau(opt_, **kw)

    ref.solvers.ReduceLROnPlateau = _compat
    tr = t.Trainer(model, _FakeLoader(), _FakeLoader(2), config,
                   mink_settings={})

    trace, events = [], []
    it = iter(script)

    def _state():
        return dict(patience=tr.patience, cooldown=tr.cooldown,
                    n_graph=tr.n_graph_construction,
                    lr=round(tr.optimizer.param_groups[0]["lr"], 12),
                    best=round(tr.best_val_part_iou, 12))

    tr._validate = lambda: (trace.append(_state()), next(it))[1]
    tr._construct_shape_graph = (
        lambda recalculate=False: events.append((bool(recalculate), tr.epoch)))
    tr._train_iter = lambda: None
    tr._log_stats = tr._log_val_stats = tr._log_params = lambda: None

    try:
        tr.train()
    finally:
        torch.autograd.set_detect_anomaly(False)  # train() sets it globally
        ref.solvers.ReduceLROnPlateau = real_plateau
    trace.append(_state())
    return trace, events


def _run_ours(tmp_path, synth_root, script, k_neighbors=1):
    from csn_tpu.tasks.main_csn import build_trainer

    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=synth_root,
        partnet_category="Display", batch_size=2, val_batch_size=2,
        test_batch_size=2, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=k_neighbors, max_epoch=len(script), stat_freq=10 ** 9,
        lr=0.05, optimizer="SGD", scheduler="ReduceLROnPlateau",
        num_points=48, level_shrink=1.5,
        log_dir=os.path.join(str(tmp_path), "logs"), seed=0,
    ).normalized()
    tr = build_trainer(cfg, phases=("train", "val"))

    trace, events = [], []
    it = iter(script)

    def _state():
        lr = tr.plateau.lr if hasattr(tr, "plateau") else cfg.lr
        return dict(patience=tr.patience, cooldown=tr.cooldown,
                    n_graph=tr.n_graph_construction,
                    lr=round(lr, 12),
                    best=round(tr.best_val_part_iou, 12))

    orig_construct = tr.construct_shape_graph

    def construct_spy(recalculate):
        events.append((bool(recalculate), tr.epoch))
        return orig_construct(recalculate)

    tr.construct_shape_graph = construct_spy
    tr.validate = lambda: (trace.append(_state()), next(it))[1]
    tr._train_iter = lambda: None
    tr.train()
    trace.append(_state())
    return trace, events


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("partnet_oracle_sm")
    write_synthetic_partnet(str(root), category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    return str(root)


@pytest.mark.slow
def test_state_machine_trace_matches_reference(ref, synth_root, tmp_path):
    script = _val_script(45)
    ref_trace, ref_events = _run_reference(ref, tmp_path / "ref", script)
    our_trace, our_events = _run_ours(tmp_path / "ours", synth_root, script)

    assert len(ref_trace) == len(script) + 1 == len(our_trace)
    for e, (r, o) in enumerate(zip(ref_trace, our_trace)):
        assert o == r, f"epoch {e + 1}: ours {o} != reference {r}"
    assert our_events == ref_events

    # the scripted plateau really exercised the machine end-to-end:
    recals = [ep for rec, ep in ref_events if rec]
    assert ref_events[0] == (False, 1)          # initial random-pairs graph
    assert len(recals) == 2                      # two rebuilds fired ...
    assert ref_trace[-1]["n_graph"] == 3         # ... then the cap held
    assert any(t["patience"] < 10 for t in ref_trace)
    assert ref_trace[-1]["lr"] < 0.05            # plateau lr stepped down


@pytest.mark.slow
def test_state_machine_k0_never_constructs(ref, synth_root, tmp_path):
    """k_neighbors=0: no graph machinery at all on either side
    (`trainer_csn.py:78,121,134`)."""
    script = _val_script(8)
    ref_trace, ref_events = _run_reference(ref, tmp_path / "ref0", script,
                                           k_neighbors=0)
    our_trace, our_events = _run_ours(tmp_path / "ours0", synth_root, script,
                                      k_neighbors=0)
    assert ref_events == [] == our_events
    # patience never drains without the graph machinery
    assert all(t["patience"] == 10 for t in ref_trace)
    for r, o in zip(ref_trace, our_trace):
        assert o == r
