"""End-to-end trainer tests on a synthetic mini-PartNet (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from csn_tpu.config import Config
from csn_tpu.data.partnet import write_synthetic_partnet, NUM_SEG


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("partnet")
    write_synthetic_partnet(str(root), category="Chair", n_train=6, n_val=3,
                            n_test=3, num_points=64)
    return str(root)


def make_config(root, tmp, **kw):
    base = dict(
        model="HRNetSimCSN2S", partnet_path=root, partnet_category="Chair",
        batch_size=2, val_batch_size=2, test_batch_size=2,
        conv1_kernel_size=3, d_model=16, n_head=2, k_neighbors=1,
        max_epoch=2, stat_freq=1, lr=0.05, optimizer="SGD",
        scheduler="ReduceLROnPlateau", num_points=64, level_shrink=1.5,
        log_dir=os.path.join(tmp, "logs"), seed=0,
        normalize_coords=True,
    )
    base.update(kw)
    return Config(**base).normalized()


@pytest.mark.slow
def test_csn_train_eval_checkpoint_resume(synth_root, tmp_path):
    from csn_tpu.tasks.main_csn import build_trainer

    cfg = make_config(synth_root, str(tmp_path))
    trainer = build_trainer(cfg, phases=("train", "val"))
    val = trainer.train()
    assert np.isfinite(val[0])
    assert 0.0 <= val[2] <= 100.0 and 0.0 <= val[3] <= 100.0
    # neighbors assigned by graph construction
    assert len(trainer.train_dataset.neighbors[0][1]) == 1
    # checkpoints written
    ck = os.path.join(cfg.log_dir, "checkpoint_HRNetSimCSN2S.msgpack")
    assert os.path.exists(ck)
    assert os.path.exists(os.path.join(cfg.log_dir, "weights.msgpack"))
    assert os.path.exists(os.path.join(cfg.log_dir, "config.json"))

    # simulate a mid-run plateau LR drop, then checkpoint: resume must
    # restore the halved lr + scheduler bests (the reference saves its
    # scheduler state_dict; caught live by a TPU soak resume going
    # 0.025 -> 0.05)
    assert hasattr(trainer, "plateau")
    trainer.plateau.lr *= 0.5
    trainer.plateau.best = 0.123
    trainer.plateau.cooldown_counter = 7
    trainer.save_checkpoint()
    dropped_lr = trainer.plateau.lr

    # resume: continues from saved state, neighbors restored
    cfg2 = make_config(synth_root, str(tmp_path), max_epoch=3,
                       resume=cfg.log_dir)
    trainer2 = build_trainer(cfg2, phases=("train", "val"))
    trainer2.initialize()
    from csn_tpu.train.optim import ReduceLROnPlateau
    trainer2.plateau = ReduceLROnPlateau(lr=cfg2.lr, factor=0.5)
    host = trainer2.resume()
    assert host["epoch"] >= 2
    assert "csn_data" in host
    assert len(trainer2.train_dataset.neighbors) == 6
    assert trainer2.plateau.lr == pytest.approx(dropped_lr)
    assert trainer2.plateau.best == pytest.approx(0.123)
    assert trainer2.plateau.cooldown_counter == 7
    assert trainer2._current_lr() == pytest.approx(dropped_lr)

    # cosine-similarity graph rebuild path
    trainer2.construct_shape_graph(recalculate=True)
    for idx, nbrs in trainer2.train_dataset.neighbors:
        assert idx not in nbrs and len(nbrs) == 1

    # test-graph construction + eval on the test split
    from csn_tpu.data.partnet import make_partnet_dataset

    test_ds = make_partnet_dataset(synth_root, "Chair", "test")
    trainer2.construct_test_graph(test_ds)
    res = trainer2.test_on(test_ds, save_pred_dir=str(tmp_path / "pred"))
    assert np.isfinite(res[0])
    assert os.path.exists(tmp_path / "pred" / "results_log.txt")


def test_apply_step_donates_param_buffers(synth_root, tmp_path):
    """Pin the donation contract at `trainer.py _apply_step`
    (donate_argnums=(0, 1)): after `_train_iter()` the PRE-update
    params/opt_state device buffers are DELETED. No code may hold a live
    device reference to params/opt_state across a `_train_iter()` — copy to
    host first (`np.asarray`). The product paths that read params
    (checkpoint saves, graph rebuilds, midfc best-IoU save) all do so
    before the next donating call; this test makes the aliasing contract
    explicit instead of incidental."""
    import jax

    from csn_tpu.tasks.main_csn import build_trainer

    cfg = make_config(synth_root, str(tmp_path))
    trainer = build_trainer(cfg, phases=("train", "val"))
    trainer.initialize()
    trainer.train_dataset.neighbors = [(i, [(i + 1) % 6]) for i in range(6)]
    old_params = jax.tree_util.tree_leaves(trainer.params)
    trainer._train_iter()
    trainer._close_prefetch()
    # every pre-update param leaf was donated into the update
    assert all(leaf.is_deleted() for leaf in old_params)
    # and the post-update state is live and usable
    assert all(not leaf.is_deleted()
               for leaf in jax.tree_util.tree_leaves(trainer.params))
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(trainer.params))


def test_seg_build_trainer_constructs_every_registered_level0_family(
        synth_root, tmp_path):
    """main_seg passes compute_dtype= to EVERY model class, so each level-0
    family must declare the field (Res16UNetBase was missing it and the
    whole family crashed at CLI construction); plain ResNet* must be
    rejected loudly — its logits live on level-5 voxels and the reference
    never registers it for seg (`models/__init__.py` omits
    `add_models(resnet)`)."""
    from csn_tpu.tasks.main_seg import build_trainer

    for name in ("Res16UNet14", "Res16UNet34C", "ResUNet14", "HRNetSeg2S"):
        cfg = make_config(synth_root, str(tmp_path), model=name,
                          k_neighbors=0, compute_dtype="bfloat16",
                          log_dir=os.path.join(str(tmp_path), name))
        t = build_trainer(cfg)
        assert t.model.compute_dtype == "bfloat16"
    with pytest.raises(ValueError, match="level 5"):
        build_trainer(make_config(synth_root, str(tmp_path),
                                  model="ResNet14", k_neighbors=0))


def test_build_trainer_honors_phase_flags(synth_root, tmp_path):
    """--train_phase/--val_phase must reach the datasets (the reference's
    lib/config.py flags; e.g. --val_phase test validates on the test
    split). Explicit phases= still wins."""
    from csn_tpu.tasks.main_seg import build_trainer

    cfg = make_config(synth_root, str(tmp_path), model="HRNetSeg2S",
                      k_neighbors=0, val_phase="test")
    t = build_trainer(cfg)
    # synthetic fixture: 6 train / 3 val / 3 test shapes, and the test
    # split is a distinct file — phase must be 'test'
    from csn_tpu.data.partnet import DatasetPhase

    assert t.val_dataset.phase == DatasetPhase.Test
    t2 = build_trainer(cfg, phases=("train", "val"))
    assert t2.val_dataset.phase == DatasetPhase.Val


def test_seg_trainer_loss_decreases(synth_root, tmp_path):
    from csn_tpu.tasks.main_seg import build_trainer

    cfg = make_config(synth_root, str(tmp_path), model="HRNetSeg2S",
                      k_neighbors=0, max_epoch=4, lr=0.1,
                      scheduler="StepLR", step_size=1000, step_gamma=0.5)
    trainer = build_trainer(cfg)
    trainer.initialize()
    trainer.train()
    # after a few epochs on an easy synthetic task the loss should have moved
    import json

    losses = []
    with open(os.path.join(cfg.log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "training/loss":
                losses.append(rec["value"])
    assert len(losses) >= 2
    assert losses[-1] < losses[0]
