"""Round-2 correctness fixes:

* prefetch queue flushed on shape-graph (re)construction, next batch reflects
  the NEW neighbor graph (stale-batch bug);
* plateau rebuild reloads the best checkpoint's optimizer state (momentum
  carry-over, `trainer_csn.py:143-148`) and resets lr to config.lr;
* eval loss ignores final-batch padding duplicates;
* flash attention picks hardware-aligned block sizes;
* `--train_limit_numpoints` masks shapes past the cumulative point limit
  (`lib/transforms.py:126-143` semantics).
"""

import os

import numpy as np
import pytest

import jax

from csn_tpu.config import Config
from csn_tpu.data.partnet import write_synthetic_partnet
from csn_tpu.train.optim import get_lr


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("partnet_r2")
    write_synthetic_partnet(str(root), category="Display", n_train=4, n_val=3,
                            n_test=2, num_points=48)
    return str(root)


@pytest.fixture(scope="module")
def trainer(synth_root, tmp_path_factory):
    from csn_tpu.tasks.main_csn import build_trainer

    cfg = Config(
        model="HRNetSimCSN2S", partnet_path=synth_root,
        partnet_category="Display", batch_size=2, val_batch_size=2,
        test_batch_size=1, conv1_kernel_size=3, d_model=16, n_head=2,
        k_neighbors=1, max_epoch=2, stat_freq=100, lr=0.05,
        optimizer="SGD", scheduler="StepLR", num_points=48, level_shrink=1.5,
        log_dir=os.path.join(str(tmp_path_factory.mktemp("logs_r2")), "run"),
        seed=0,
    ).normalized()
    tr = build_trainer(cfg, phases=("train", "val"))
    tr.initialize()
    tr.construct_shape_graph(recalculate=False)
    tr.n_graph_construction += 1
    return tr


def test_prefetch_flushed_on_graph_construction(trainer):
    trainer._train_iter()  # starts the prefetcher
    assert trainer._prefetch is not None
    trainer.construct_shape_graph(recalculate=False)
    # the queue of old-graph batches must be gone
    assert trainer._prefetch is None

    # point every query at neighbor 0 and verify the next fetched key batch
    # really is shape 0 (i.e. no stale batch is consumed)
    n = len(trainer.train_dataset)
    trainer.train_dataset.neighbors = [(i, [0]) for i in range(n)]
    qb, keys = trainer._fetch_data(augment=False)
    expected, feats, _ = trainer.train_dataset.get(0, augment=False)
    # compact device batches drop `points`; the xyz input FEATURES identify
    # the shape just as well (PartNet: AUGMENT_COORDS_TO_FEATS)
    kfeats = np.asarray(keys[0].point_feats, np.float32)
    kmask = np.asarray(keys[0].point_mask)
    for b in range(kfeats.shape[0]):
        p = int(kmask[b].sum())
        np.testing.assert_allclose(kfeats[b, :p], feats[:p], rtol=1e-2,
                                   atol=1e-3)  # f16 wire


def test_plateau_rebuild_reloads_optimizer_state(trainer):
    trainer._train_iter()  # build up momentum
    trainer.save_checkpoint(postfix="best_part_iou")
    saved = jax.tree_util.tree_map(np.asarray, trainer.opt_state)

    trainer._train_iter()  # momentum moves on
    moved = jax.tree_util.tree_map(np.asarray, trainer.opt_state)
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(saved),
                        jax.tree_util.tree_leaves(moved)))

    trainer.config.resume_optimizer = True
    trainer._rebuild_on_plateau()

    # optimizer state (momentum buffers + step counter) back to the best
    # checkpoint's values, lr reset to config.lr
    reloaded = jax.tree_util.tree_map(np.asarray, trainer.opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(reloaded)):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    assert get_lr(trainer.opt_state) == pytest.approx(trainer.config.lr)
    assert trainer.patience == trainer.MAX_PATIENCE
    assert trainer.cooldown == trainer.MAX_COOLDOWN
    trainer._close_prefetch()


def test_eval_loss_ignores_padding_duplicates(trainer):
    # val split has 3 shapes: batch_size 2 pads the final batch with a
    # duplicate; its loss contribution must be masked out.
    trainer.config.test_batch_size = 1
    loss_1, _, piou_1, siou_1 = trainer.test_on(trainer.val_dataset)
    trainer.config.test_batch_size = 2
    loss_2, _, piou_2, siou_2 = trainer.test_on(trainer.val_dataset)
    assert loss_2 == pytest.approx(loss_1, rel=1e-4)
    assert piou_2 == pytest.approx(piou_1, rel=1e-5)
    assert siou_2 == pytest.approx(siou_1, rel=1e-5)
    trainer.config.test_batch_size = 1


def test_flash_prep_block_alignment():
    import jax.numpy as jnp

    from csn_tpu.ops.flash import _prep

    q = jnp.zeros((1, 2, 500, 16))
    k = jnp.zeros((1, 2, 500, 16))
    v = jnp.zeros((1, 2, 500, 16))
    qf, kf, vf, mp, qmp, bq, bk, lqp, lkp = _prep(q, k, v, None, None, 512, 1024)
    assert bq % 8 == 0 and bk % 128 == 0
    assert lqp % bq == 0 and lkp % bk == 0
    assert qf.shape == (2, lqp, 16)


def test_train_limit_numpoints_masks_tail(trainer):
    from csn_tpu.train.trainer import build_batch_from_dataset

    rng = np.random.default_rng(0)
    batch = build_batch_from_dataset(
        trainer.train_dataset, [0, 1, 2], trainer.spec, rng, augment=False,
        limit_numpoints=100)  # shapes are 48 points each -> keep 2 of 3
    assert batch.point_mask[:2].all()
    assert not batch.point_mask[2:].any()
    for m in batch.masks:
        assert not m[2:].any()
    assert (batch.labels[2:] == 255).all()


def test_extraction_export_roundtrip(tmp_path):
    """export_features -> FeaturesDataset loads identical features/labels
    (the MID-FC on-disk contract, `tfsolver.py:241-268`)."""
    from csn_tpu.midfc.data import FeaturesDataset
    from csn_tpu.midfc.extraction import export_features

    rng = np.random.default_rng(0)
    shapes = [
        (f"shape_{i}",
         rng.normal(size=(30 + i, 8)).astype(np.float32),
         rng.integers(0, 5, size=(30 + i,)).astype(np.int64))
        for i in range(3)
    ]
    export_features(str(tmp_path), shapes)
    ds = FeaturesDataset(str(tmp_path), num_points=40)
    assert len(ds) == 3
    for i, (_, feats, labels) in enumerate(shapes):
        f, l = ds[i]
        h = feats.shape[0]
        np.testing.assert_allclose(f[:h], feats, rtol=1e-6)
        np.testing.assert_array_equal(l[:h], labels)
        # pad-by-prefix-repetition beyond h (`features_data_loader.py:37-43`)
        np.testing.assert_allclose(f[h:], feats[: 40 - h], rtol=1e-6)


def test_dead_flags_removed_and_flash_auto():
    fields = {f.name for f in __import__("dataclasses").fields(Config)}
    for gone in ("return_neighbors", "val_freq", "save_freq"):
        assert gone not in fields
    cfg = Config()
    assert cfg.use_flash == "auto"
    # tests run on CPU -> auto resolves to the XLA path
    assert cfg.resolved_use_flash() is False
