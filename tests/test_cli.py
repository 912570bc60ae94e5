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


def test_testing_csn_sh_loops_categories(tmp_path):
    """scripts/testing_csn.sh (the reference's 17-category eval driver,
    `MinkowskiNet/scripts/testing_csn.sh:1-40`): train two tiny synthetic
    categories, then one `testing_csn.sh all` run must resolve each
    category's newest checkpoint dir, evaluate it, write results_log.txt,
    and aggregate via collect_partnet_results."""
    import subprocess
    import sys

    from csn_tpu.tasks import main_csn

    root = str(tmp_path / "data")
    base = tmp_path / "outputs"
    cats = ["Display", "Clock"]
    for cat in cats:
        write_synthetic_partnet(root, category=cat, n_train=4, n_val=2,
                                n_test=2, num_points=48)
        log_dir = str(base / "Partnet" / cat / "HRNetSimCSN2S-K1" / "run0")
        main_csn.main([
            "--model", "HRNetSimCSN2S", "--partnet_path", root,
            "--partnet_category", cat, "--batch_size", "2",
            "--val_batch_size", "2", "--test_batch_size", "2",
            "--conv1_kernel_size", "3", "--k_neighbors", "1",
            "--d_model", "16", "--n_head", "2",
            "--max_epoch", "1", "--stat_freq", "10", "--lr", "0.05",
            "--scheduler", "StepLR", "--num_points", "48",
            "--level_shrink", "1.5", "--log_dir", log_dir, "--seed", "0",
        ])
        assert os.path.exists(os.path.join(log_dir, "weights.msgpack"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DATAPATH=root, MODEL="HRNetSimCSN2S",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    # the per-category eval adds CLI extras via test_csn.sh "$@" passthrough
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "testing_csn.sh"), "all", "1",
         str(base)], env=env, capture_output=True, text=True, timeout=1200,
        cwd=repo)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    for cat in cats:
        log = (base / "Partnet" / cat / "HRNetSimCSN2S-K1" / "run0"
               / f"{cat}_evaluation" / "results" / "results_log.txt")
        assert log.exists(), (cat, proc.stdout, proc.stderr)
    # the loop skipped (and reported) the 15 categories with no checkpoint
    assert "no checkpoint found" in proc.stderr
