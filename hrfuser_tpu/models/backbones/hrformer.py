"""Camera-only HRNet / HRFormer backbone.

Rebuild of `HRNet` (`mmdet/models/backbones/hrnet.py:210-586`) and
`HRFormer` (`hrformer.py:564-740`): a 2-conv stride-2 stem, a Bottleneck
stage 1, then three multi-resolution stages connected by transitions. The
block type of each stage (conv BASIC vs HRFORMER transformer) comes from
the config, so this single class covers both reference backbones.
Outputs: one NHWC feature map per branch at strides {4, 8, 16, 32}.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.common import ConvNorm, ResLayer
from hrfuser_tpu.models.backbones.hr_config import HRBackboneCfg
from hrfuser_tpu.models.backbones.hr_modules import HRStage, Transition

Array = jnp.ndarray
Dtype = Any


class Stem(nn.Module):
    """conv3x3/2 -> BN -> ReLU -> conv3x3/2 -> BN -> ReLU (64 ch)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = ConvNorm(64, 3, 2, act=True, dtype=self.dtype,
                     name='conv1')(x, train)
        x = ConvNorm(64, 3, 2, act=True, dtype=self.dtype,
                     name='conv2')(x, train)
        return x


class HRFormerBackbone(nn.Module):
    cfg: HRBackboneCfg
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        cfg = self.cfg
        x = Stem(dtype=self.dtype, name='stem')(x, train)
        x = ResLayer(cfg.stage1.block, cfg.stage1.num_channels[0],
                     cfg.stage1.num_blocks[0], 64, dtype=self.dtype,
                     name='layer1')(x, train)
        stage1_out = (cfg.stage1.out_channels[0],)

        xs = Transition(stage1_out, cfg.stage2.out_channels,
                        dtype=self.dtype, name='transition1')([x], train)
        xs = HRStage(cfg.stage2, cfg.stage2.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel,
                     dtype=self.dtype,
                     name='stage2')(xs, train)

        xs = Transition(cfg.stage2.out_channels, cfg.stage3.out_channels,
                        dtype=self.dtype, name='transition2')(xs, train)
        xs = HRStage(cfg.stage3, cfg.stage3.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel,
                     dtype=self.dtype,
                     name='stage3')(xs, train)

        xs = Transition(cfg.stage3.out_channels, cfg.stage4.out_channels,
                        dtype=self.dtype, name='transition3')(xs, train)
        xs = HRStage(cfg.stage4, cfg.stage4.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel,
                     dtype=self.dtype,
                     name='stage4')(xs, train)
        return xs
