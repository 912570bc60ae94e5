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


@pytest.mark.slow
def test_testing_csn_sh_loops_categories(tmp_path):
    """scripts/testing_csn.sh (the reference's 17-category eval driver,
    `MinkowskiNet/scripts/testing_csn.sh:1-40`): train two tiny synthetic
    categories, then one `testing_csn.sh all` run must resolve each
    category's newest checkpoint dir, evaluate it, write results_log.txt,
    and aggregate via collect_partnet_results."""
    import subprocess

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


@pytest.mark.slow
def test_parity_session_synthetic(tmp_path):
    """scripts/parity_session.sh (PARITY.md §§1-4 in one command, VERDICT r3
    #6) rehearsed end-to-end on synthetic stand-ins: a MID-FC msgpack
    checkpoint + feature dumps + knn graphs, a Mink training checkpoint +
    synthetic PartNet. The session must evaluate both branches, write the
    report CSV, assert vs the (injected) expectation tables, exit 0 — and
    exit 1 when an expectation is violated."""
    import subprocess

    from csn_tpu.midfc.data import write_synthetic_midfc
    from csn_tpu.midfc.get_csa_pred import main as pred_main
    from csn_tpu.midfc.run_training import NAMES, SEG_NUM
    from csn_tpu.midfc.training import MidfcConfig, MidfcRunner, _save
    from csn_tpu.tasks import main_csn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cat, P, C = "Bed", 24, 8
    n_cls = SEG_NUM[NAMES.index(cat)]

    # --- MID-FC stand-ins: features, a pretrained msgpack ckpt, knn graphs
    feats_root = str(tmp_path / "features")
    for split, n in (("train", 3), ("test", 2)):
        write_synthetic_midfc(os.path.join(feats_root, split, cat),
                              n_shapes=n, num_points=P, channels=C,
                              num_classes=5, seed=0)
    K, n_heads = 1, 2
    cfg = MidfcConfig(partname=cat, num_classes=n_cls, n_heads=n_heads, K=K,
                      batch_size=1, d_model=C, chunk_size=P // 2,
                      num_points=P)
    runner = MidfcRunner(cfg, "csa")
    rng = np.random.default_rng(0)
    f0 = rng.normal(size=(1, P, C)).astype(np.float32)
    runner.initialize(f0, np.repeat(f0[:, None], K + 1, axis=1))
    ckpts = tmp_path / "midfc_ckpts"
    os.makedirs(ckpts / cat)
    _save(runner.params, str(ckpts / cat / "trained_layers.msgpack"))
    graphs = tmp_path / "graphs" / f"n_heads_{n_heads}" / cat
    os.makedirs(graphs)
    np.save(str(graphs / "test.npy"), np.array([[0, 1], [1, 0]]))
    np.save(str(graphs / "train.npy"), np.array([[1, 2], [2, 0], [0, 1]]))

    midfc_flags = ["--n_heads", str(n_heads), "--K", str(K),
                   "--chunk_size", str(P // 2), "--d_model", str(C),
                   "--num_points", str(P)]
    exp_midfc = float(pred_main(
        ["--data_root", feats_root, "--partname", cat,
         "--num_classes", str(n_cls),
         "--msgpack_ckpt", str(ckpts / cat / "trained_layers.msgpack"),
         "--knn_graph_dir", str(graphs),
         "--logs_dir", str(tmp_path / "direct_pred")] + midfc_flags)) * 100

    # --- Mink stand-ins: train a tiny ckpt, direct-eval it for expectations
    partnet = str(tmp_path / "partnet")
    write_synthetic_partnet(partnet, category="Display", n_train=4, n_val=2,
                            n_test=2, num_points=48)
    log_dir = str(tmp_path / "mink_train")
    mink_flags = ["--model", "HRNetSimCSN2S", "--conv1_kernel_size", "3",
                  "--k_neighbors", "1", "--d_model", "16", "--n_head", "2",
                  "--num_points", "48", "--level_shrink", "1.5"]
    main_csn.main(mink_flags + [
        "--partnet_path", partnet, "--partnet_category", "Display",
        "--batch_size", "2", "--val_batch_size", "2",
        "--test_batch_size", "2", "--max_epoch", "1", "--stat_freq", "10",
        "--scheduler", "StepLR", "--log_dir", log_dir, "--seed", "0"])
    mink_ckpts = tmp_path / "mink_ckpts"
    os.makedirs(mink_ckpts / "Display")
    import shutil

    # weights.msgpack is an atomic symlink to the latest checkpoint — copy
    # the resolved file (a moved symlink would dangle)
    shutil.copy(os.path.realpath(os.path.join(log_dir, "weights.msgpack")),
                str(mink_ckpts / "Display" / "weights.msgpack"))
    res = main_csn.main(mink_flags + [
        "--is_train", "False",
        "--weights", str(mink_ckpts / "Display" / "weights.msgpack"),
        "--partnet_path", partnet, "--partnet_category", "Display",
        "--batch_size", "2", "--test_batch_size", "2",
        "--log_dir", str(tmp_path / "direct_eval"),
        "--save_pred_dir", str(tmp_path / "direct_eval" / "results")])
    exp_mink = float(res[2])

    csv_midfc = tmp_path / "expected_midfc.csv"
    csv_midfc.write_text(f"{cat},{exp_midfc:.6f},0.01\n")
    csv_mink = tmp_path / "expected_mink.csv"
    csv_mink.write_text(f"Display,{exp_mink:.6f},0.01\n")

    out = tmp_path / "parity_out"
    session_args = midfc_flags + [
        "--categories", f"{cat},Display",
        "--expected_csv", str(csv_midfc),
        "--mink_expected_csv", str(csv_mink),
        "--batch_size_mink", "2",
        "--mink_extra", "--conv1_kernel_size", "3", "--d_model", "16",
        "--n_head", "2", "--num_points", "48", "--level_shrink", "1.5",
        "--val_batch_size", "2",
    ]
    env = dict(os.environ,
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "parity_session.sh"),
         str(ckpts), feats_root, partnet, str(mink_ckpts),
         str(tmp_path / "graphs"), str(out), "--model", "HRNetSimCSN2S",
         "--k_neighbors", "1"] + session_args,
        env=env, capture_output=True, text=True, timeout=1200, cwd=repo)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY SESSION: PASS" in proc.stdout, proc.stdout
    report = (out / "parity_report.csv").read_text()
    assert f"midfc,{cat}" in report and "mink,Display" in report, report

    # a violated expectation must FAIL the session (exit 1) — midfc-only
    # rerun to keep it cheap
    csv_bad = tmp_path / "expected_bad.csv"
    csv_bad.write_text(f"{cat},{exp_midfc + 5.0:.6f},0.01\n")
    from csn_tpu.tasks.parity_session import main as session_main

    rc = session_main(midfc_flags + [
        "--midfc_ckpts", str(ckpts), "--midfc_features", feats_root,
        "--knn_graphs", str(tmp_path / "graphs"),
        "--out", str(tmp_path / "parity_bad"),
        "--categories", cat, "--expected_csv", str(csv_bad)])
    assert rc == 1

    # a PLANNED category whose artifacts are missing must FAIL (exit 1),
    # not silently skip — a partial download must never print PASS while
    # asserting only a fraction of the expectation table
    csv_two = tmp_path / "expected_two.csv"
    csv_two.write_text(f"{cat},{exp_midfc:.6f},0.01\nChair,50.0,0.01\n")
    rc = session_main(midfc_flags + [
        "--midfc_ckpts", str(ckpts), "--midfc_features", feats_root,
        "--knn_graphs", str(tmp_path / "graphs"),
        "--out", str(tmp_path / "parity_missing"),
        "--expected_csv", str(csv_two)])
    assert rc == 1

    # pass-through flags with fewer than 6 positionals must reach python,
    # not be eaten as the optional positionals (old shift-6 bug): --out
    # must win, proving the flag survived
    d = tmp_path / "sh_out"
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "parity_session.sh"),
         "-", "x", "-", "--out", str(d)],
        env=env, capture_output=True, text=True, timeout=300, cwd=repo)
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert d.is_dir()
