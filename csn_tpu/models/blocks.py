"""Residual blocks over the sparse voxel engine.

Mirrors `MinkowskiNet/models/modules/resnet_block.py` (BasicBlock/Bottleneck
with BATCH/INSTANCE/INSTANCE_BATCH/LAYER norm variants). Stride is always 1
here: every strided transition in the reference models is an explicit conv,
and `_make_layer` is only ever invoked with stride=1 in shipped configs
(`models/hrnet.py:55-69`, `models/res16unet.py:45-160`).
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from csn_tpu.models.layers import (
    Conv1x1, Norm, NormType, SparseConv, relu_masked,
)


class BasicBlock(nn.Module):
    """Two 3x3x3 sparse convs + residual (`resnet_block.py:8-57`)."""

    planes: int
    level: int
    norm_type: NormType = NormType.BATCH_NORM
    bn_momentum: float = 0.02

    expansion = 1

    @nn.compact
    def __call__(self, batch, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        mask = batch.masks[self.level]
        shape = mask.shape
        mname = f"same{self.level}k3"
        residual = x

        out = SparseConv(self.planes, mname)(batch, x, shape)
        out = Norm(self.norm_type, self.bn_momentum)(out, mask, train)
        out = relu_masked(out, mask)
        out = SparseConv(self.planes, mname)(batch, out, shape)
        out = Norm(self.norm_type, self.bn_momentum)(out, mask, train)

        if x.shape[-1] != self.planes * self.expansion:
            residual = Conv1x1(self.planes * self.expansion, use_bias=False)(x)
            residual = Norm(self.norm_type, self.bn_momentum)(residual, mask, train)

        return relu_masked(out + residual, mask)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck (`resnet_block.py:76-136`; expansion=1, bottleneck=4
    as in the reference)."""

    planes: int
    level: int
    norm_type: NormType = NormType.BATCH_NORM
    bn_momentum: float = 0.02

    expansion = 1
    bottleneck = 4

    @nn.compact
    def __call__(self, batch, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        mask = batch.masks[self.level]
        shape = mask.shape
        mname = f"same{self.level}k3"
        mid = self.planes // self.bottleneck
        residual = x

        out = Conv1x1(mid, use_bias=False)(x)
        out = Norm(self.norm_type, self.bn_momentum)(out, mask, train)
        out = relu_masked(out, mask)
        out = SparseConv(mid, mname)(batch, out, shape)
        out = Norm(self.norm_type, self.bn_momentum)(out, mask, train)
        out = relu_masked(out, mask)
        out = Conv1x1(self.planes * self.expansion, use_bias=False)(out)
        out = Norm(self.norm_type, self.bn_momentum)(out, mask, train)

        if x.shape[-1] != self.planes * self.expansion:
            residual = Conv1x1(self.planes * self.expansion, use_bias=False)(x)
            residual = Norm(self.norm_type, self.bn_momentum)(residual, mask, train)

        return relu_masked(out + residual, mask)


class BasicBlockIN(BasicBlock):
    """`resnet_block.py:62-63`."""

    norm_type: NormType = NormType.INSTANCE_NORM


class BasicBlockINBN(BasicBlock):
    """`resnet_block.py:66-67`."""

    norm_type: NormType = NormType.INSTANCE_BATCH_NORM


class BasicBlockLN(BasicBlock):
    """`resnet_block.py:70-71`."""

    norm_type: NormType = NormType.LAYER_NORM


class BottleneckIN(Bottleneck):
    """`resnet_block.py:143-144`."""

    norm_type: NormType = NormType.INSTANCE_NORM


class BottleneckINBN(Bottleneck):
    """`resnet_block.py:147-148`."""

    norm_type: NormType = NormType.INSTANCE_BATCH_NORM


BLOCKS = {
    "BasicBlock": BasicBlock, "Bottleneck": Bottleneck,
    "BasicBlockIN": BasicBlockIN, "BasicBlockINBN": BasicBlockINBN,
    "BasicBlockLN": BasicBlockLN, "BottleneckIN": BottleneckIN,
    "BottleneckINBN": BottleneckINBN,
}
