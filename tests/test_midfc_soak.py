"""Trajectory-level convergence evidence for the MID-FC two-phase CSA
protocol (VERDICT r3 #8): `train_csa` (`csa_training.py:261-387` — two
24-epoch phases with the mid-phase kNN-graph rebuild, lr steps at epochs 10
and 18, best-IoU checkpointing) run to completion on a learnable synthetic
task, asserting the loss/IoU trajectories behave across the rebuild — the
step-level tests cannot see a regression that only shows up as a broken
trajectory (e.g. the rebuild feeding the second phase a graph computed from
the wrong params, or the lr reset diverging from the reloaded best).

Mirrors the Mink branch's 25-epoch CSN soak in spirit: statistical
assertions with slack, not exact values."""

import os

import numpy as np


def _write_learnable_tree(root, n_shapes, P, C, w, seed):
    """Feature dumps whose labels are a fixed projection of the features —
    learnable and generalizable across splits (same w)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "fc_1"), exist_ok=True)
    os.makedirs(os.path.join(root, "point_labels"), exist_ok=True)
    for i in range(n_shapes):
        feats = rng.normal(size=(P, C)).astype(np.float32)
        labels = (feats @ w).argmax(-1).astype(np.int64) + 1  # 1..n_cls-1
        np.save(os.path.join(root, "fc_1", f"shape_{i:02d}.npy"),
                feats.T[None, :, :, None])  # [1, C, H, 1] dump layout
        np.save(os.path.join(root, "point_labels", f"shape_{i:02d}.npy"),
                labels)


def test_csa_two_phase_convergence_soak(tmp_path):
    from csn_tpu.midfc.training import MidfcConfig, train_csa

    P, C, K, n_cls = 32, 8, 1, 5
    rng = np.random.default_rng(0)
    w = rng.normal(size=(C, n_cls - 1)).astype(np.float32)
    train_root = str(tmp_path / "train")
    test_root = str(tmp_path / "test")
    _write_learnable_tree(train_root, 8, P, C, w, seed=1)
    _write_learnable_tree(test_root, 4, P, C, w, seed=2)

    # initial graphs: arbitrary valid neighbors (the protocol's own rebuild
    # replaces them mid-run)
    tr_graph = np.stack([np.roll(np.arange(8), -i)[:K + 1] for i in range(8)])
    te_graph = np.stack([np.roll(np.arange(8), -i)[:K + 1] for i in range(4)])

    # accumulation 1: the protocol's default 32 exceeds the 4 batches/epoch
    # here (one optimizer step per epoch — too slow for a 48-epoch soak)
    cfg = MidfcConfig(logs_dir=str(tmp_path / "logs"), partname="Bed",
                      num_classes=n_cls, n_heads=2, K=K, batch_size=2,
                      d_model=C, chunk_size=P // 2, num_points=P, seed=0,
                      gradient_accumulation_steps=1, lr=3e-3)
    history = []
    best_iou, ckpt = train_csa(cfg, train_root, test_root, tr_graph,
                               te_graph, history=history)

    assert len(history) == 48 and os.path.exists(ckpt)
    assert all(np.isfinite(h["train_loss"]) and np.isfinite(h["val_loss"])
               for h in history)
    p1 = [h for h in history if h["phase"] == 0]
    p2 = [h for h in history if h["phase"] == 1]

    # (1) phase 1 learns: late train loss well below early train loss
    early = np.mean([h["train_loss"] for h in p1[:3]])
    late1 = np.mean([h["train_loss"] for h in p1[-3:]])
    assert late1 < 0.7 * early, (early, late1)

    # (2) the task is actually solved to a useful degree (labels are a
    # linear function of the inputs; the CSA head must fit it)
    assert best_iou > 0.5, best_iou
    assert best_iou > history[0]["val_iou"], (best_iou, history[0])

    # (3) the mid-phase rebuild hands phase 2 a sane starting point: phase 2
    # resumes FROM THE RELOADED BEST params (lr resets, so allow slack) —
    # its early val loss must not blow past phase 1's early val loss
    v1_early = np.mean([h["val_loss"] for h in p1[:3]])
    v2_early = np.mean([h["val_loss"] for h in p2[:3]])
    assert v2_early < v1_early, (v1_early, v2_early)

    # (4) the rebuild IMPROVES the metric, not just avoids regressing it:
    # phase 2 trains on graphs retrieved by the phase-1-trained SSA features
    # instead of the arbitrary initial graph (observed 0.42 -> 0.61 with the
    # fixed seed; deterministic on a given backend)
    b1 = max(h["val_iou"] for h in p1)
    b2 = max(h["val_iou"] for h in p2)
    assert b2 > b1, (b1, b2)

    # (5) best-IoU bookkeeping: returned best == max over the trajectory
    # (the final reload-best validate may add one more row via the CSV but
    # not via history)
    assert abs(best_iou - max(h["val_iou"] for h in history)) < 1e-9
