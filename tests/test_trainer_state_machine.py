"""CSN plateau -> reload-best -> rebuild-graph state machine
(`MinkowskiNet/lib/trainer_csn.py:115-158`): force patience exhaustion on a
tiny run and verify the rebuild fires, resets counters, reloads the best
checkpoint, and respects MAX_GRAPH_CONSTRUCTION."""

import os

import numpy as np
import pytest

from csn_tpu.config import Config
from csn_tpu.data.partnet import write_synthetic_partnet


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("partnet_sm")
    write_synthetic_partnet(str(root), category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    return str(root)


@pytest.mark.slow
def test_patience_exhaustion_triggers_graph_rebuild(synth_root, tmp_path):
    from csn_tpu.tasks.main_csn import build_trainer
    from csn_tpu.train.trainer import CSNTrainer

    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=synth_root,
        partnet_category="Display", batch_size=2, val_batch_size=2,
        test_batch_size=2, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=1, max_epoch=6, stat_freq=100, lr=0.0,  # lr=0: no
        optimizer="SGD", scheduler="ReduceLROnPlateau",     # improvement
        num_points=48, level_shrink=1.5,
        log_dir=os.path.join(str(tmp_path), "logs"), seed=0,
    ).normalized()

    trainer = build_trainer(cfg, phases=("train", "val"))
    # shrink the state machine so it fires within 6 epochs
    trainer.MAX_PATIENCE, trainer.MAX_COOLDOWN = 2, 1
    trainer.patience, trainer.cooldown = 2, 1

    rebuilds = []
    orig = CSNTrainer.construct_shape_graph

    def spy(self, recalculate):
        rebuilds.append(recalculate)
        return orig(self, recalculate)

    trainer.construct_shape_graph = spy.__get__(trainer)
    trainer.train()

    # first construction is random pairs; with lr=0 val IoU never improves
    # past the first epoch's best, so patience exhausts and at least one
    # cosine rebuild fires (recalculate=True)
    assert rebuilds[0] is False
    assert any(rebuilds[1:]), f"no rebuild fired: {rebuilds}"
    assert trainer.n_graph_construction >= 2
    assert trainer.n_graph_construction <= trainer.MAX_GRAPH_CONSTRUCTION + 1
    # counters were reset after the rebuild
    assert trainer.patience >= 0
    # best-part-iou checkpoint exists (it was reloaded during the rebuild)
    assert os.path.exists(os.path.join(
        cfg.log_dir, "checkpoint_HRNetSimCSN2Sbest_part_iou.msgpack"))
