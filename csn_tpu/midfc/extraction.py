"""MID-FC feature extraction: the on-disk contract and an export helper.

The reference extracts per-point `fc_1` features with a TF1 O-CNN HRNet run
inside Microsoft O-CNN's `tensorflow/script/` tree (`MID-FC/ocnn_extraction/
tfsolver.py:206-268` writes `fc_1/`, `pts/`, `point_labels/`, `midfc_pred/`
npy dirs per split/category; `run_seg_partnet.py`, `network_hrnet.py` define
the octree network). The extraction stack depends on O-CNN's native octree
CUDA ops and pretrained MID-FC checkpoints; this framework consumes the
*extracted* features (SURVEY.md §2.3: "the MID-FC branch consumes only the
extracted features; rebuild treats extraction as a fixed-format dataset").

This module documents that contract and provides `export_features(...)` so any
per-point feature producer (including this framework's own HRNet backbones,
via `HRNetSimCSN._features` + trilinear point readout) can write
MID-FC-compatible feature dumps for the SSA/CSA head path.

Directory layout per (split, category):
    <root>/<split>/<Category>/fc_1/shape_i.npy          [1, C, H_i, 1] float32
    <root>/<split>/<Category>/point_labels/shape_i.npy  [H_i] int
    (optional) pts/shape_i.npy, midfc_pred/shape_i.npy
"""

from __future__ import annotations

import os
from typing import Iterable, Tuple

import numpy as np


def export_features(
    out_root: str,
    shapes: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    pts: bool = False,
):
    """Write (name, point_feats [H, C], labels [H]) shapes in the MID-FC
    on-disk format (`tfsolver.py:241-268`)."""
    fc_dir = os.path.join(out_root, "fc_1")
    lab_dir = os.path.join(out_root, "point_labels")
    os.makedirs(fc_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    for name, feats, labels in shapes:
        arr = np.asarray(feats, dtype=np.float32).T[None, :, :, None]
        np.save(os.path.join(fc_dir, f"{name}.npy"), arr)
        np.save(os.path.join(lab_dir, f"{name}.npy"),
                np.asarray(labels).astype(np.int64))


def export_from_model(out_root: str, model, variables, batches,
                      names: Iterable[str]):
    """Extract per-point features from a csn_tpu sparse model and dump them in
    MID-FC format: runs the model's feature head on each VoxelBatch and reads
    out per-point features via trilinear interpolation."""
    import jax

    from csn_tpu.core.interp import interpolate_to_points

    name_it = iter(names)
    out = []
    for vb in batches:
        jb = vb.to_jax() if hasattr(vb, "to_jax") else vb
        feats = model.apply(variables, jb, train=False, return_ssa=True)
        pt_feats = np.asarray(interpolate_to_points(
            feats, jb.interp_idx, jb.interp_w))
        labels = np.asarray(jb.labels)
        mask = np.asarray(jb.point_mask)
        for b in range(pt_feats.shape[0]):
            m = mask[b]
            out.append((next(name_it), pt_feats[b][m], labels[b][m]))
    export_features(out_root, out)
