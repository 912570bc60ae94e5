"""Data pipeline tests: augmentations (reference semantics), normalization,
PartNet h5 dataset, infinite sampler, prefetcher, config system."""

import os

import numpy as np
import pytest

from csn_tpu.data import transforms as T
from csn_tpu.data.partnet import (
    NUM_SEG, PartnetDataset, make_partnet_dataset, write_synthetic_partnet,
)
from csn_tpu.data.prefetch import Prefetcher
from csn_tpu.data.sampler import InfSampler


def test_num_seg_matches_reference_table():
    # `MinkowskiNet/lib/datasets/partnet.py:11-27`
    assert NUM_SEG["Chair"] == 39 and NUM_SEG["Table"] == 51
    assert NUM_SEG["Display"] == 4 and len(NUM_SEG) == 17


def test_normalize_coords_sphere_and_box():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(100, 3)) * 5 + 3
    s = T.normalize_coords(c, "sphere")
    assert abs(np.linalg.norm(s, axis=1).max() - 1.0) < 1e-6
    np.testing.assert_allclose(s.mean(axis=0), 0, atol=1e-9)
    b = T.normalize_coords(c, "box")
    diag = np.linalg.norm(b.max(0) - b.min(0))
    assert abs(diag - 1.0) < 1e-6
    with pytest.raises(ValueError):
        T.normalize_coords(c, "nope")


def test_rotation_augmentation_about_y():
    rng = np.random.default_rng(1)
    c = rng.normal(size=(50, 3))
    rot = T.RotationAugmentation(bound=(0.3, 0.3))  # fixed angle
    c2, f2, _ = rot(c, c.copy(), None, rng)
    # y unchanged, norms preserved
    np.testing.assert_allclose(c2[:, 1], c[:, 1], atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(c2, axis=1),
                               np.linalg.norm(c, axis=1), atol=1e-9)


def test_scaling_and_jitter_and_shift():
    rng = np.random.default_rng(2)
    c = rng.normal(size=(30, 3))
    c2, _, _ = T.RandomScaling(0.75, 1.25)(c, None, None, rng)
    ratios = c2 / c
    assert np.allclose(ratios, ratios.flat[0])  # uniform isotropic
    assert 0.75 <= ratios.flat[0] <= 1.25

    c3, _, _ = T.RandomJittering(0.25, 0.25, 0.25)(c, None, None, rng)
    off = c3 - c
    assert np.allclose(off, off[0])  # whole-shape offset
    assert np.all(np.abs(off[0]) <= 0.25)

    c4, _, _ = T.RandomShift(0.01, 0.05)(c, None, None, rng)
    off = c4 - c
    assert np.allclose(off, off[0])
    assert np.all(np.abs(off[0]) <= 0.05)  # clip


def test_partnet_dataset_load_and_augment(tmp_path):
    root = str(tmp_path)
    write_synthetic_partnet(root, category="Display", n_train=5, n_val=2,
                            n_test=2, num_points=50)
    ds = make_partnet_dataset(root, "Display", "train", distort=True)
    assert len(ds) == 5
    assert ds.num_labels == NUM_SEG["Display"]
    rng = np.random.default_rng(0)
    c1, f1, l1 = ds.get(0, rng=rng, augment=True)
    c0, f0, l0 = ds.get(0, augment=False)
    assert c1.shape == (50, 3) and l1.shape == (50,)
    assert not np.allclose(c1, c0)          # augmentation applied
    np.testing.assert_allclose(f1, c1)      # xyz features track coords
    # normalized input: inside unit sphere
    assert np.linalg.norm(c0, axis=1).max() <= 1.0 + 1e-6
    # val split has no augmentation
    val = make_partnet_dataset(root, "Display", "val", distort=True)
    cv1, _, _ = val.get(0, rng=rng, augment=True)
    cv0, _, _ = val.get(0, augment=False)
    np.testing.assert_allclose(cv1, cv0)


def test_inf_sampler_permutes_and_repeats():
    s = InfSampler(5, shuffle=True, rng=np.random.default_rng(0))
    first = s.take(5)
    assert sorted(first) == [0, 1, 2, 3, 4]
    second = s.take(5)
    assert sorted(second) == [0, 1, 2, 3, 4]


def test_prefetcher_produces_and_propagates_errors():
    counter = {"n": 0}

    def make():
        counter["n"] += 1
        return counter["n"]

    pf = Prefetcher(make, depth=2)
    vals = [next(pf) for _ in range(5)]
    assert vals == [1, 2, 3, 4, 5]
    pf.close()

    def boom():
        raise RuntimeError("nope")

    pf2 = Prefetcher(boom, depth=1)
    with pytest.raises(RuntimeError):
        next(pf2)
    pf2.close()


def test_config_cli_and_resume_reload(tmp_path):
    from csn_tpu.config import Config, get_config

    cfg = get_config(["--model", "HRNetSimCSN3S", "--lr", "0.05",
                      "--distort_partnet", "True", "--k_neighbors", "2"])
    assert cfg.model == "HRNetSimCSN3S" and cfg.lr == 0.05
    # distort macro expansion (`lib/config.py:147-152`)
    assert cfg.rot_aug and cfg.jitter and cfg.scale and not cfg.shift
    assert cfg.voxel_size() == 0.05
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2 == cfg

    # resume reload (`tasks/main_csn.py:32-35`)
    import json

    logdir = tmp_path / "run"
    logdir.mkdir()
    with open(logdir / "config.json", "w") as f:
        json.dump({**d, "lr": 0.123}, f)
    cfg3 = get_config(["--resume", str(logdir)])
    assert cfg3.lr == 0.123 and cfg3.resume == str(logdir)
