"""Res16UNet family (16x-downsampling sparse U-Nets).

Mirror of `MinkowskiNet/models/res16unet.py`: stem conv (k=conv1_kernel_size),
four k2/s2 downsampling convs with residual stages, four k2/s2 transpose convs
with skip concatenations, final 1x1 head. Width/depth variants
Res16UNet{14,18,34,50,101}{,A,B,C,D,...} as in `res16unet.py:232-306`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from csn_tpu.core.pyramid import MapSpec
from csn_tpu.models.blocks import BasicBlock, Bottleneck
from csn_tpu.models.layers import Conv1x1, Norm, NormType, SparseConv, relu_masked
from csn_tpu.models.hrnet import _dedup


class Res16UNetBase(nn.Module):
    out_channels: int
    conv1_kernel_size: int = 5
    bn_momentum: float = 0.02
    # bf16 activations with f32 params/norm stats, like the sibling families
    # (resnet.py:53, resunet.py:26) — main_seg passes this to every model
    compute_dtype: str = "float32"

    BLOCK = BasicBlock
    PLANES = (32, 64, 128, 256, 256, 256, 256, 256)
    LAYERS = (2, 2, 2, 2, 2, 2, 2, 2)
    INIT_DIM = 32
    NORM_TYPE = NormType.BATCH_NORM

    @classmethod
    def num_levels(cls) -> int:
        return 5

    @classmethod
    def pyramid_requirements(cls, conv1_kernel_size: int = 5) -> Tuple[MapSpec, ...]:
        maps = [MapSpec("same", 0, conv1_kernel_size)]
        maps += [MapSpec("same", l, 3) for l in range(5)]
        maps += [MapSpec("down", l, 2) for l in range(4)]
        maps += [MapSpec("up", l, 2) for l in range(4)]
        return _dedup(maps)

    def _blocks(self, planes, level, n):
        return tuple(self.BLOCK(planes=planes, level=level,
                                norm_type=self.NORM_TYPE,
                                bn_momentum=self.bn_momentum)
                     for _ in range(n))

    def setup(self):
        nt, bm = self.NORM_TYPE, self.bn_momentum
        P, L = self.PLANES, self.LAYERS
        self.conv0 = SparseConv(self.INIT_DIM, f"same0k{self.conv1_kernel_size}")
        self.norm0 = Norm(nt, bm)
        self.down_convs = tuple(
            SparseConv(self.INIT_DIM if l == 0 else P[l - 1], f"down{l}k2")
            for l in range(4)
        )
        self.down_norms = tuple(Norm(nt, bm) for _ in range(4))
        self.enc_blocks = tuple(
            self._blocks(P[l], l + 1, L[l]) for l in range(4)
        )
        self.up_convs = tuple(
            SparseConv(P[4 + s], f"up{3 - s}k2") for s in range(4)
        )
        self.up_norms = tuple(Norm(nt, bm) for _ in range(4))
        self.dec_blocks = tuple(
            self._blocks(P[4 + s], 3 - s, L[4 + s]) for s in range(4)
        )
        self.final = Conv1x1(self.out_channels, use_bias=True, f32=True)

    def __call__(self, batch, train: bool = False):
        m = batch.masks
        x = self.conv0(batch, batch.vox_feats.astype(self.compute_dtype),
                       m[0].shape)
        x = self.norm0(x, m[0], train)
        out_p1 = relu_masked(x, m[0])

        skips = [out_p1]
        x = out_p1
        for l in range(4):
            x = self.down_convs[l](batch, x, m[l + 1].shape)
            x = self.down_norms[l](x, m[l + 1], train)
            x = relu_masked(x, m[l + 1])
            for blk in self.enc_blocks[l]:
                x = blk(batch, x, train)
            skips.append(x)

        # decoder: levels 4 -> 0, concatenating skips from levels 3..0
        for s in range(4):
            lvl = 4 - s
            x = self.up_convs[s](batch, x, m[lvl - 1].shape)
            x = self.up_norms[s](x, m[lvl - 1], train)
            x = relu_masked(x, m[lvl - 1])
            x = jnp.concatenate([x, skips[lvl - 1]], axis=-1)
            for blk in self.dec_blocks[s]:
                x = blk(batch, x, train)

        return self.final(x)


class Res16UNet14(Res16UNetBase):
    LAYERS = (1, 1, 1, 1, 1, 1, 1, 1)


class Res16UNet18(Res16UNetBase):
    LAYERS = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet34(Res16UNetBase):
    LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet50(Res16UNetBase):
    BLOCK = Bottleneck
    LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet101(Res16UNetBase):
    BLOCK = Bottleneck
    LAYERS = (2, 3, 4, 23, 2, 2, 2, 2)


class Res16UNet14A(Res16UNet14):
    PLANES = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet14A2(Res16UNet14A):
    LAYERS = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B(Res16UNet14):
    PLANES = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet14B2(Res16UNet14B):
    LAYERS = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B3(Res16UNet14B):
    LAYERS = (2, 2, 2, 2, 1, 1, 1, 1)


class Res16UNet14C(Res16UNet14):
    PLANES = (32, 64, 128, 256, 192, 192, 128, 128)


class Res16UNet14D(Res16UNet14):
    PLANES = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet18A(Res16UNet18):
    PLANES = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet18B(Res16UNet18):
    PLANES = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet18D(Res16UNet18):
    PLANES = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet34A(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 64, 64)


class Res16UNet34B(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 64, 32)


class Res16UNet34C(Res16UNet34):
    PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
