"""MID-FC feature extraction: the TPU-native replacement for the reference's
O-CNN extraction stack, plus the on-disk contract helpers.

The reference produces the MID-FC branch's inputs with a TF1 octree HRNet run
inside Microsoft O-CNN's `tensorflow/script/` tree:
`MID-FC/ocnn_extraction/run_seg_partnet.py:17-91` (graph + loss),
`network_hrnet.py:131-261` (octree HRNet whose `seg_header_pts` emits
per-point features and whose `predict_module` returns `(logit, fc_1)`,
`ocnn.py:225-237`), and `tfsolver.py:206-268` (the `test()` loop writing
`fc_1/`, `pts/`, `point_labels/`, `midfc_pred/` npy dirs per split/category).

The TPU-native equivalent does not rebuild octrees (SURVEY.md §2.3): the
extractor is this framework's own sparse-voxel `HRNetSeg` — trained with the
ordinary segmentation objective via `SegTrainer` — whose 2-layer head exposes
the same `fc_1` hidden feature (`HRNetSeg(..., return_fc1=True)`), read out
per point by trilinear interpolation. `extract_split` then writes the exact
MID-FC on-disk contract, so the SSA -> kNN -> CSA chain
(csn_tpu/midfc/training.py) runs end-to-end from raw point clouds.
CLI: `python -m csn_tpu.tasks.extract_features` (the `run_seg_partnet.py` /
`run_seg_partnet_test_cmd.py` analogue).

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


def extract_split(model, variables, dataset, spec, out_root: str,
                  batch_size: int = 4, save_pts: bool = True) -> int:
    """The `tfsolver.py:206-268` extraction loop: run the trained HRNetSeg on
    every shape of `dataset` (no augmentation) and dump per-shape `fc_1/`
    (stored `[1, C, H, 1]` like the reference), `point_labels/`, `pts/` and
    `midfc_pred/` npy files under `out_root`. Returns the number of shapes
    written."""
    import jax

    from csn_tpu.core.interp import interp_batch
    from csn_tpu.train.losses import predict_nonzero
    from csn_tpu.train.trainer import build_batch_from_dataset

    @jax.jit
    def step(variables, qb):
        logits, fc1 = model.apply(variables, qb, train=False, return_fc1=True)
        pt_fc1 = interp_batch(fc1, qb)
        pt_logits = interp_batch(logits, qb)
        return pt_fc1, predict_nonzero(pt_logits)

    dirs = {n: os.path.join(out_root, n)
            for n in ("fc_1", "point_labels", "pts", "midfc_pred")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(0)
    n = len(dataset)
    written = 0
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        valid = len(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        qb_host = build_batch_from_dataset(dataset, idxs, spec, rng,
                                           augment=False)
        pt_fc1, pred = step(variables, qb_host.to_jax())
        pt_fc1 = np.asarray(pt_fc1)
        pred = np.asarray(pred)
        for b in range(valid):
            m = qb_host.point_mask[b]
            name = f"{start + b:05d}"
            feats = pt_fc1[b][m].astype(np.float32)        # [H, C]
            np.save(os.path.join(dirs["fc_1"], name + ".npy"),
                    feats.T[None, :, :, None])
            np.save(os.path.join(dirs["point_labels"], name + ".npy"),
                    qb_host.labels[b][m].astype(np.int64))
            np.save(os.path.join(dirs["midfc_pred"], name + ".npy"),
                    pred[b][m].astype(np.int64))
            if save_pts:
                np.save(os.path.join(dirs["pts"], name + ".npy"),
                        (qb_host.points[b][m] * spec.voxel_size
                         ).astype(np.float32))
            written += 1
    return written


def export_from_model(out_root: str, model, variables, batches,
                      names: Iterable[str]):
    """Extract per-point features from a csn_tpu sparse model and dump them in
    MID-FC format: runs the model's feature head on each VoxelBatch and reads
    out per-point features via trilinear interpolation."""
    import jax

    from csn_tpu.core.interp import interp_batch

    name_it = iter(names)
    out = []
    for vb in batches:
        jb = vb.to_jax() if hasattr(vb, "to_jax") else vb
        feats = model.apply(variables, jb, train=False, return_ssa=True)
        pt_feats = np.asarray(interp_batch(feats, jb))
        labels = np.asarray(jb.labels)
        mask = np.asarray(jb.point_mask)
        for b in range(pt_feats.shape[0]):
            m = mask[b]
            out.append((next(name_it), pt_feats[b][m], labels[b][m]))
    export_features(out_root, out)
