"""Plain segmentation entry point (port of `MinkowskiNet/tasks/main_seg.py`)."""

from __future__ import annotations

import logging

from csn_tpu.config import Config, get_config
from csn_tpu.data.partnet import NUM_SEG, make_partnet_dataset
from csn_tpu.data.pipeline import pyramid_spec_for_model
from csn_tpu.models import load_model
from csn_tpu.train.trainer import SegTrainer
from csn_tpu.utils.logging import setup_logging


def build_trainer(config: Config, phases=None) -> SegTrainer:
    # default: the reference's --train_phase/--val_phase flags
    # (`lib/config.py`), so e.g. --val_phase test validates on the test
    # split; callers may still pass explicit phases.
    if phases is None:
        phases = (config.train_phase, config.val_phase)
    num_labels = NUM_SEG[config.partnet_category.split("-")[0]]
    model_cls = load_model(config.model)
    out_level = getattr(model_cls, "output_level", None)
    if out_level is not None and out_level() != 0:
        raise ValueError(
            f"{config.model} outputs voxel logits at level "
            f"{model_cls.output_level()}, but the segmentation readout "
            f"(trilinear voxel->point interpolation) requires a level-0 "
            f"output. The reference never registers this family for seg "
            f"either (`MinkowskiNet/models/__init__.py` omits "
            f"`add_models(resnet)`); use ResUNet*/Res16UNet*/HRNet*.")
    kw = {}
    if "HRNet" in config.model:  # fc_1 head width (256 in the reference)
        kw["d_model"] = config.d_model
    model = model_cls(
        out_channels=num_labels,
        conv1_kernel_size=config.conv1_kernel_size,
        bn_momentum=config.bn_momentum,
        compute_dtype=config.resolved_compute_dtype(), **kw)
    spec = pyramid_spec_for_model(
        model_cls, num_points=config.num_points,
        voxel_size=config.voxel_size(),
        conv1_kernel_size=config.conv1_kernel_size,
        level0_cap=config.level0_cap or None,
        qmode=config.qmode(), shrink=config.level_shrink,
        use_windows=config.resolved_use_windows(),
        batch_sizes=(config.batch_size, config.val_batch_size,
                      config.test_batch_size))
    train_ds = make_partnet_dataset(
        config.partnet_path, config.partnet_category, phases[0],
        distort=config.distort_partnet, normalize=config.normalize_coords,
        normalize_method=config.normalize_method)
    val_ds = make_partnet_dataset(
        config.partnet_path, config.partnet_category, phases[1],
        normalize=config.normalize_coords,
        normalize_method=config.normalize_method)
    return SegTrainer(model, config, spec, train_ds, val_ds, num_labels)


def main(argv=None):
    from csn_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    config = get_config(argv)
    setup_logging()
    logging.info("===> Configurations: %s", config)
    if config.is_train:
        trainer = build_trainer(config)
        trainer.train()
    else:
        trainer = build_trainer(config)
        trainer.initialize()
        if config.resume:
            trainer.resume()
        test_ds = make_partnet_dataset(
            config.partnet_path, config.partnet_category, config.test_phase,
            normalize=config.normalize_coords,
            normalize_method=config.normalize_method)
        res = trainer.test_on(test_ds, save_pred_dir=config.save_pred_dir)
        logging.info("Test: loss %.4f score %.3f PartIoU %.2f ShapeIoU %.2f",
                     *res)
        return res


if __name__ == "__main__":
    main()
