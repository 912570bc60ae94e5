"""IoU / precision metrics vs hand-computed values and cross-checks between
the numpy (exact) and device-side (batched) implementations."""

import numpy as np
import jax.numpy as jnp

from csn_tpu.train import metrics as M


def test_precision_at_one_partnet():
    pred = np.array([1, 2, 3, 1, 5])
    target = np.array([1, 2, 0, 255, 4])
    # correct: pos0 (match), pos1 (match), pos2 (target 0 counts), pos4 wrong;
    # pos3 ignored -> 3/4
    assert abs(M.precision_at_one_partnet(pred, target) - 75.0) < 1e-6


def test_calculate_iou_forces_pred_zero_on_gt_zero():
    ground = np.array([0, 1, 1, 2, 2, 2])
    pred = np.array([1, 1, 2, 2, 2, 0])
    m = M.calculate_iou(ground, pred, num_labels=3)
    # label 1: gt {1,2}, pred {1} -> I=1, U=2 (pred[0] forced to 0)
    assert m["intersection"][1] == 1 and m["union"][1] == 2
    # label 2: gt {3,4,5}, pred {2,3,4} -> I=2, U=4
    assert m["intersection"][2] == 2 and m["union"][2] == 4


def test_shape_and_part_iou_aggregation():
    ious = {
        0: {"label_iou": {1: 0.5, 2: 1.0},
            "intersection": {1: 1.0, 2: 2.0}, "union": {1: 2.0, 2: 2.0}},
        1: {"label_iou": {1: 1.0},
            "intersection": {1: 3.0}, "union": {1: 3.0}},
    }
    # shape iou: mean(mean(0.5,1.0), mean(1.0)) = mean(0.75, 1.0) = 0.875
    assert abs(M.calculate_shape_iou(ious) - 0.875) < 1e-9
    # part iou (num_labels=4): I1/U1 = 4/5, I2/U2 = 2/2, label3 absent -> 0
    # avg over 3 labels = (0.8 + 1.0 + 0.0)/3
    assert abs(M.calculate_part_iou(ious, 4) - (0.8 + 1.0) / 3) < 1e-9


def test_device_iu_matches_numpy_path():
    rng = np.random.default_rng(0)
    B, P, L = 3, 50, 6
    target = rng.integers(0, L, size=(B, P)).astype(np.int32)
    pred = rng.integers(1, L, size=(B, P)).astype(np.int32)
    mask = rng.random((B, P)) < 0.9
    inter, union = M.batch_intersection_union(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask), L)
    part, shape = M.mink_metrics_from_iu(np.asarray(inter), np.asarray(union), L)

    ious = {}
    for b in range(B):
        g = target[b][mask[b]]
        p = pred[b][mask[b]]
        ious[b] = M.calculate_iou(g, p, L)
    assert abs(part - M.calculate_part_iou(ious, L)) < 1e-9
    assert abs(shape - M.calculate_shape_iou(ious)) < 1e-9


def test_midfc_part_iou():
    # dataset-aggregated I/U over labels 0..C-1 on points with label>0,
    # normalized by C-1 (`MID-FC/ssa_training.py:99-123,185-188`)
    target = np.array([[1, 1, 2, 0, 2]])
    pred = np.array([[1, 2, 2, 1, 0]])
    acc = M.MidfcIoUAccumulator(class_num=3)
    acc.update(pred[0], target[0])
    # masked (label>0): target [1,1,2,2], pred [1,2,2,0]
    # k=0: I=0, U=1 (pred 0) -> 0; k=1: I=1,U=2; k=2: I=1,U=3
    expected = (0.0 / (1 + 1e-10) + 1 / (2 + 1e-10) + 1 / (3 + 1e-10)) / 2
    assert abs(acc.result() - expected) < 1e-9
