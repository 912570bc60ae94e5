"""ResUNet family (4-level sparse U-Nets).

Mirror of `MinkowskiNet/models/resunet.py` (MinkUNetBase): stem conv + block at
level 0, three k2/s2 downs with residual stages, three k2/s2 transpose ups with
skip concatenations, 2-layer 1x1 head. Variants `resunet.py:193-242`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.core.pyramid import MapSpec
from csn_tpu.models.blocks import BasicBlock, BasicBlockINBN, Bottleneck
from csn_tpu.models.layers import Conv1x1, MaskedBatchNorm, Norm, NormType, \
    SparseConv, relu_masked
from csn_tpu.models.hrnet import _dedup


class ResUNetBase(nn.Module):
    out_channels: int
    conv1_kernel_size: int = 5
    bn_momentum: float = 0.02
    compute_dtype: str = "float32"

    BLOCK = BasicBlock
    PLANES = (64, 128, 256, 512, 256, 128, 128)
    LAYERS = (2, 2, 2, 2, 2, 2)
    INIT_DIM = 64
    NORM_TYPE = NormType.BATCH_NORM

    @classmethod
    def num_levels(cls) -> int:
        return 4

    @classmethod
    def pyramid_requirements(cls, conv1_kernel_size: int = 5) -> Tuple[MapSpec, ...]:
        maps = [MapSpec("same", 0, conv1_kernel_size)]
        maps += [MapSpec("same", l, 3) for l in range(4)]
        maps += [MapSpec("down", l, 2) for l in range(3)]
        maps += [MapSpec("up", l, 2) for l in range(3)]
        return _dedup(maps)

    def _blocks(self, planes, level, n):
        return tuple(self.BLOCK(planes=planes, level=level,
                                norm_type=self.NORM_TYPE,
                                bn_momentum=self.bn_momentum)
                     for _ in range(n))

    def setup(self):
        nt, bm = self.NORM_TYPE, self.bn_momentum
        P, L = self.PLANES, self.LAYERS
        self.conv0 = SparseConv(self.INIT_DIM, f"same0k{self.conv1_kernel_size}",
                                input_grad=False)
        self.norm0 = Norm(nt, bm)
        self.block0 = self._blocks(P[0], 0, L[0])
        self.down_convs = tuple(
            SparseConv(P[l], f"down{l}k2") for l in range(3)
        )
        self.down_norms = tuple(Norm(nt, bm) for _ in range(3))
        self.enc_blocks = tuple(
            self._blocks(P[l + 1], l + 1, L[l + 1]) for l in range(3)
        )
        self.up_convs = tuple(
            SparseConv(P[4 + s], f"up{2 - s}k2") for s in range(3)
        )
        self.up_norms = tuple(Norm(nt, bm) for _ in range(3))
        # decoder blocks after concat (levels 2 and 1); level 0 concat goes
        # straight to the head (`resunet.py:185-190`).
        self.dec_blocks = tuple(
            self._blocks(P[4 + s], 2 - s, L[4 + s]) for s in range(2)
        )
        self.final_fc = Conv1x1(512, use_bias=True)
        self.final_norm = MaskedBatchNorm(momentum=0.1)
        self.final_out = Conv1x1(self.out_channels, use_bias=True, f32=True)

    def __call__(self, batch, train: bool = False):
        m = batch.masks
        x = self.conv0(batch, batch.vox_feats.astype(self.compute_dtype),
                       m[0].shape)
        x = self.norm0(x, m[0], train)
        x = relu_masked(x, m[0])
        for blk in self.block0:
            x = blk(batch, x, train)

        skips = [x]
        for l in range(3):
            x = self.down_convs[l](batch, x, m[l + 1].shape)
            x = self.down_norms[l](x, m[l + 1], train)
            x = relu_masked(x, m[l + 1])
            for blk in self.enc_blocks[l]:
                x = blk(batch, x, train)
            if l < 2:
                skips.append(x)

        for s in range(3):
            lvl = 3 - s
            x = self.up_convs[s](batch, x, m[lvl - 1].shape)
            x = self.up_norms[s](x, m[lvl - 1], train)
            x = relu_masked(x, m[lvl - 1])
            x = jnp.concatenate([x, skips[lvl - 1]], axis=-1)
            if s < 2:
                for blk in self.dec_blocks[s]:
                    x = blk(batch, x, train)

        x = self.final_fc(x)
        x = self.final_norm(x, m[0], train)
        x = relu_masked(x, m[0])
        return self.final_out(x).astype(jnp.float32)


class ResUNet14(ResUNetBase):
    LAYERS = (1, 1, 1, 1, 1, 1)


class ResUNet18(ResUNetBase):
    LAYERS = (2, 2, 2, 2, 2, 2)


class ResUNet18INBN(ResUNet18):
    """`resunet.py:203-205`."""

    NORM_TYPE = NormType.INSTANCE_BATCH_NORM
    BLOCK = BasicBlockINBN


class ResUNet34(ResUNetBase):
    LAYERS = (3, 4, 6, 3, 2, 2)


class ResUNet50(ResUNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 6, 3, 2, 2)


class ResUNet101(ResUNetBase):
    BLOCK = Bottleneck
    LAYERS = (3, 4, 23, 3, 2, 2)


class ResUNet14D(ResUNet14):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet18D(ResUNet18):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34D(ResUNet34):
    PLANES = (64, 128, 256, 512, 512, 512, 512)


class ResUNet34E(ResUNet34):
    INIT_DIM = 32
    PLANES = (32, 64, 128, 256, 128, 64, 64)


class ResUNet34F(ResUNet34):
    INIT_DIM = 32
    PLANES = (32, 64, 128, 256, 128, 64, 32)
