"""Batch assembly: raw point clouds -> static-shape VoxelBatch for a model.

Replaces the reference's collate + ME.TensorField construction
(`lib/transforms.py:104-152`, `lib/trainer_csn.py:236-258`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from csn_tpu.core.pyramid import (
    PyramidSpec, QMode, VoxelBatch, build_voxel_batch, default_level_caps,
)


def pyramid_spec_for_model(
    model_cls,
    num_points: int,
    voxel_size: float,
    conv1_kernel_size: int = 5,
    level_caps: Optional[Tuple[int, ...]] = None,
    level0_cap: Optional[int] = None,
    qmode: QMode = QMode.RANDOM_SUBSAMPLE,
    shrink: float = 3.0,
    use_windows: bool = False,
    dense_stem_grid: Optional[int] = 0,
    sort_points: Optional[bool] = None,
    batch_sizes: Optional[Sequence[int]] = None,
) -> PyramidSpec:
    """Derive the static pyramid signature a model needs.

    dense_stem_grid: per-shape grid side G for the dense stem conv
    (core/conv.py dense_stem_conv). 0 = off (DEFAULT: measured a wash vs
    the windowed one-hot stem on v5e — scatter/gather row costs eat the
    conv win; see STATUS perf series). None = auto: G sized for sphere/
    box-normalized inputs (extent <= ~2.6 world units incl. augmentation
    slack) at this voxel size, disabled when the grid would be
    unreasonably large (tiny voxels) — batches that overflow G fall back
    per-batch anyway."""
    nl = model_cls.num_levels()
    maps = model_cls.pyramid_requirements(conv1_kernel_size)
    if level_caps is None:
        base = level0_cap if level0_cap is not None else num_points
        level_caps = default_level_caps(base, nl, shrink=shrink)
        if use_windows and batch_sizes:
            # Windowed-conv worklists only survive batch concatenation (the
            # combined (K+1)B CSA pass) when a batch's B*cap is a multiple
            # of window_conv.TILE=256; default 32-rounded caps guarantee
            # that only for B % 8 == 0. Round the derived caps up so every
            # batch size NEEDING AT MOST a 64-multiple (B % 4 == 0) stays
            # aligned — a few percent of rows (e.g. B=4: 864 -> 896), far
            # cheaper than losing the windowed kernels. Batch sizes of
            # 1/2 (the shipped val/test defaults) would force 256-multiples
            # and inflate deep caps 33-300%, so they keep the old behavior:
            # the concat path logs the drop and falls back to the XLA
            # gather conv for that phase; use a batch size divisible by 4 to
            # keep windowed eval. (User-supplied level_caps are respected
            # as-is.)
            from math import gcd

            mult = 32
            for b in batch_sizes:
                need = 256 // gcd(256, int(b))
                if need <= 64:
                    mult = mult * need // gcd(mult, need)
            level_caps = tuple(-(-c // mult) * mult for c in level_caps)
    if dense_stem_grid is None:
        g = int(np.ceil(2.6 / voxel_size)) + 2
        dense_stem_grid = g if g ** 3 <= 320_000 and g <= 254 else 0
    return PyramidSpec(
        voxel_size=voxel_size,
        num_points=num_points,
        level_caps=tuple(level_caps),
        maps=tuple(maps),
        qmode=qmode,
        use_windows=use_windows,
        dense_stem_grid=dense_stem_grid,
        # voxel-sorted points ride with the windowed-kernel path by default
        # (they enable the windowed interp worklists; see PyramidSpec)
        sort_points=use_windows if sort_points is None else sort_points,
    )


def collate_shapes(
    shapes: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    spec: PyramidSpec,
    rng: Optional[np.random.Generator] = None,
    ignore_label: int = 255,
) -> VoxelBatch:
    return build_voxel_batch(shapes, spec, rng=rng, ignore_label=ignore_label)
