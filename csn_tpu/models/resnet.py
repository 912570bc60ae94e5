"""ResNet family (strided sparse classification-style backbones).

Mirror of `MinkowskiNet/models/resnet.py`. Note: the reference's BasicBlock
passes `stride` to *both* of its convs (`modules/resnet_block.py:22-36`) and
its `_make_layer` downsample projection uses stride 1 (`resnet.py:96-105`),
which cannot produce aligned coordinate maps in ME either — this family is
unused by shipped configs. We implement the standard semantics: the first
block of each layer downsamples once (k3/s2 conv + k1/s2 projection), the
rest run at the target level.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.core.pyramid import MapSpec
from csn_tpu.models.blocks import BasicBlock, Bottleneck
from csn_tpu.models.layers import Conv1x1, Norm, NormType, SparseConv, \
    relu_masked, sum_pool
from csn_tpu.models.hrnet import _dedup


class _StridedBasicBlock(nn.Module):
    """BasicBlock whose first conv moves level -> level+1 (stride 2)."""

    planes: int
    level: int  # source level
    norm_type: NormType = NormType.BATCH_NORM
    bn_momentum: float = 0.02

    @nn.compact
    def __call__(self, batch, x, train: bool):
        src, dst = self.level, self.level + 1
        m_dst = batch.masks[dst]
        out = SparseConv(self.planes, f"down{src}k3")(batch, x, m_dst.shape)
        out = Norm(self.norm_type, self.bn_momentum)(out, m_dst, train)
        out = relu_masked(out, m_dst)
        out = SparseConv(self.planes, f"same{dst}k3")(batch, out, m_dst.shape)
        out = Norm(self.norm_type, self.bn_momentum)(out, m_dst, train)

        residual = SparseConv(self.planes, f"down{src}k1")(batch, x, m_dst.shape)
        residual = Norm(self.norm_type, self.bn_momentum)(residual, m_dst, train)
        return relu_masked(out + residual, m_dst)


class ResNetBase(nn.Module):
    out_channels: int
    conv1_kernel_size: int = 5
    bn_momentum: float = 0.02
    compute_dtype: str = "float32"

    BLOCK = BasicBlock
    LAYERS = ()
    INIT_DIM = 64
    PLANES = (64, 128, 256, 512)
    NORM_TYPE = NormType.BATCH_NORM

    @classmethod
    def num_levels(cls) -> int:
        return 6

    @classmethod
    def output_level(cls) -> int:
        """Logits live on stride-32 voxels (level 5). The reference never
        registers plain ResNet for segmentation — `models/__init__.py`
        omits `add_models(resnet)`; the family is the inheritance base for
        ResUNet — and the point readout (`soutput.interpolate`) assumes a
        level-0 output, so main_seg rejects output_level != 0 models."""
        return 5

    @classmethod
    def pyramid_requirements(cls, conv1_kernel_size: int = 5) -> Tuple[MapSpec, ...]:
        maps = [MapSpec("same", 0, conv1_kernel_size)]
        maps += [MapSpec("down", 0, 2), MapSpec("up", 0, 2)]  # sum pooling
        maps += [MapSpec("same", l, 3) for l in range(1, 6)]
        maps += [MapSpec("down", l, 3) for l in range(1, 5)]
        maps += [MapSpec("up", l, 3) for l in range(1, 5)]
        maps += [MapSpec("down", l, 1) for l in range(1, 5)]
        maps += [MapSpec("up", l, 1) for l in range(1, 5)]
        return _dedup(maps)

    def setup(self):
        nt, bm = self.NORM_TYPE, self.bn_momentum
        self.conv0 = SparseConv(self.INIT_DIM, f"same0k{self.conv1_kernel_size}",
                                input_grad=False)
        self.norm0 = Norm(nt, bm)
        layers = []
        for i in range(4):
            src_level = i + 1
            stage = [_StridedBasicBlock(planes=self.PLANES[i], level=src_level,
                                        norm_type=nt, bn_momentum=bm)]
            for _ in range(1, self.LAYERS[i]):
                stage.append(self.BLOCK(planes=self.PLANES[i],
                                        level=src_level + 1, norm_type=nt,
                                        bn_momentum=bm))
            layers.append(tuple(stage))
        self.layers = tuple(layers)
        self.final = Conv1x1(self.out_channels, use_bias=True, f32=True)

    def __call__(self, batch, train: bool = False):
        m = batch.masks
        x = self.conv0(batch, batch.vox_feats.astype(self.compute_dtype),
                       m[0].shape)
        x = self.norm0(x, m[0], train)
        x = relu_masked(x, m[0])
        x = sum_pool(batch, x, "down0k2", m[1].shape)
        for stage in self.layers:
            for blk in stage:
                x = blk(batch, x, train)
        return self.final(x).astype(jnp.float32)


class ResNet14(ResNetBase):
    LAYERS = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    LAYERS = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    LAYERS = (3, 4, 6, 3)


class ResNet50(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 6, 3)


class ResNet101(ResNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 23, 3)
