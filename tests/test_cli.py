"""CLI entry-point smoke tests: full argv -> config -> train -> eval ->
results-log -> collector path on synthetic data."""

import os

import numpy as np
import pytest

from csn_tpu.data.partnet import write_synthetic_partnet


def test_main_seg_cli_train_and_eval(tmp_path):
    from csn_tpu.tasks import main_seg
    from csn_tpu.tasks import collect_partnet_results as collect

    root = str(tmp_path / "data")
    write_synthetic_partnet(root, category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    log_dir = str(tmp_path / "Display_run" )
    argv = [
        "--model", "HRNetSeg2S", "--partnet_path", root,
        "--partnet_category", "Display", "--batch_size", "2",
        "--val_batch_size", "2", "--test_batch_size", "2",
        "--conv1_kernel_size", "3", "--k_neighbors", "0",
        "--max_epoch", "1", "--stat_freq", "10", "--lr", "0.05",
        "--scheduler", "StepLR", "--num_points", "48",
        "--level_shrink", "1.5", "--log_dir", log_dir, "--seed", "0",
    ]
    main_seg.main(argv)
    assert os.path.exists(os.path.join(log_dir, "weights.msgpack"))

    pred_dir = os.path.join(log_dir, "results")
    res = main_seg.main(argv + ["--is_train", "False",
                                "--resume", log_dir,
                                "--save_pred_dir", pred_dir])
    assert np.isfinite(res[0])
    assert os.path.exists(os.path.join(pred_dir, "results_log.txt"))

    rows = collect.main(["--results_root", str(tmp_path),
                         "--pattern", "{cat}_run/results/results_log.txt"])
    assert len(rows) == 1 and rows[0][0] == "Display"
    assert rows[0][1] is not None and rows[0][2] is not None
