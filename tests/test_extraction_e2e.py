"""End-to-end MID-FC pipeline FROM RAW POINT CLOUDS — the TPU-native
equivalent of the reference's O-CNN extraction subsystem
(`MID-FC/ocnn_extraction/tfsolver.py:206-268` + `network_hrnet.py:170-191`):

synthetic PartNet h5 -> train the HRNetSeg extractor (SegTrainer) -> dump
fc_1/point_labels/pts/midfc_pred npy dirs -> SSA training -> kNN graph save
-> CSA two-phase training -> a CSA IoU. No pre-extracted inputs anywhere.
"""

import dataclasses
import os

import numpy as np
import pytest

from csn_tpu.data.partnet import write_synthetic_partnet


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("extract_e2e")
    root = os.path.join(str(base), "partnet")
    write_synthetic_partnet(root, category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    return str(base), root


def test_extract_to_csa_end_to_end(roots):
    base, root = roots
    feats_root = os.path.join(base, "features")

    # 1) train the extractor + dump features via the CLI entry point
    from csn_tpu.tasks.extract_features import main as extract_main

    counts = extract_main([
        "--partnet_path", root, "--partnet_category", "Display",
        "--model", "HRNetSeg2S", "--conv1_kernel_size", "3",
        "--d_model", "16", "--batch_size", "2", "--val_batch_size", "2",
        "--test_batch_size", "2", "--max_epoch", "1", "--stat_freq", "100",
        "--num_points", "48", "--level_shrink", "1.5",
        "--log_dir", os.path.join(base, "seg_logs"),
        "--save_pred_dir", feats_root, "--seed", "0",
    ])
    assert counts == {"train": 4, "test": 2}

    train_root = os.path.join(feats_root, "train", "Display")
    test_root = os.path.join(feats_root, "test", "Display")
    # on-disk contract: fc_1 stored [1, C, H, 1] like the reference
    f0 = np.load(os.path.join(train_root, "fc_1", "00000.npy"))
    assert f0.ndim == 4 and f0.shape[0] == 1 and f0.shape[1] == 16 \
        and f0.shape[3] == 1
    l0 = np.load(os.path.join(train_root, "point_labels", "00000.npy"))
    assert l0.shape[0] == f0.shape[2]
    assert os.path.exists(os.path.join(train_root, "pts", "00000.npy"))
    assert os.path.exists(os.path.join(train_root, "midfc_pred", "00000.npy"))

    # 2) SSA head training on the dumps
    from csn_tpu.midfc.data import FeaturesDataset
    from csn_tpu.midfc.training import (
        MidfcConfig, MidfcRunner, load_params, save_knn_graphs, train_csa,
        train_ssa,
    )

    cfg = MidfcConfig(
        logs_dir=os.path.join(base, "ssa_logs"), partname="Display",
        num_classes=4, n_heads=2, K=1, batch_size=2, d_model=16,
        gradient_accumulation_steps=1, epochs=2, chunk_size=None,
        num_points=48, seed=0)
    tr_ds = FeaturesDataset(train_root, 48)
    te_ds = FeaturesDataset(test_root, 48)
    ssa_iou, ssa_path = train_ssa(cfg, tr_ds, te_ds)
    assert os.path.exists(ssa_path)
    assert 0.0 <= ssa_iou <= 1.0

    # 3) kNN graphs from the trained SSA model (save_knn_graph.py restored)
    runner = MidfcRunner(cfg, "ssa")
    f0b, _, _ = next(iter(tr_ds.batches(cfg.batch_size)))
    runner.initialize(f0b)
    runner.params = load_params(runner.params, ssa_path)
    graph_dir = save_knn_graphs(runner, tr_ds, te_ds, K=1,
                                partname="Display",
                                logs_root=os.path.join(base, "logs"))
    tr_graph = np.load(os.path.join(graph_dir, "train.npy"))
    te_graph = np.load(os.path.join(graph_dir, "test.npy"))
    assert tr_graph.shape[0] == 4 and te_graph.shape[0] == 2
    # self-retrieval: with K=1 the top entry of a train row is the shape
    # itself (excluded downstream by CSADatasetK)
    assert (tr_graph[:, 0] == np.arange(4)).all()

    # 4) CSA two-phase training (testing=True: one batch/epoch, one epoch/
    #    phase, but BOTH phases + the mid-run kNN rebuild execute)
    csa_cfg = dataclasses.replace(
        cfg, logs_dir=os.path.join(base, "csa_logs"), weight_decay=5e-4,
        testing=True)
    csa_iou, csa_path = train_csa(csa_cfg, train_root, test_root, tr_graph,
                                  te_graph, ssa_params_path=ssa_path)
    assert os.path.exists(csa_path)
    assert 0.0 <= csa_iou <= 1.0
    # summary CSV written (test_summaries.csv contract)
    assert os.path.exists(os.path.join(csa_cfg.logs_dir,
                                       "test_summaries.csv"))
