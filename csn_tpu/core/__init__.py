from csn_tpu.core.pyramid import (
    MapSpec,
    PyramidSpec,
    VoxelBatch,
    build_voxel_batch,
    QMode,
)
from csn_tpu.core.conv import sparse_conv, sparse_conv_with_bias
from csn_tpu.core.interp import interpolate_to_points
