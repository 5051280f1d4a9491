"""HR multi-branch modules and transitions (flax.linen, NHWC).

Rebuild of `HRModule` (`mmdet/models/backbones/hrnet.py:14-207`), the
HRFormer variant with depthwise-separable fuse downsampling
(`hrformer.py:549-561`), and `_make_transition_layer`
(`hrnet.py:422-463`).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.attention import HRFormerBlock, resolve_layout
from hrfuser_tpu.ops.pallas_chain import resolve_chain
from hrfuser_tpu.layers.common import (ConvNorm, ResLayer, bilinear_resize,
                                       nearest_up)
from hrfuser_tpu.models.backbones.hr_config import StageCfg

Array = jnp.ndarray
Dtype = Any


class Transition(nn.Module):
    """Between-stage channel/branch adaptation (`hrnet.py:422-463`).

    For existing branches: 3x3 conv+BN+ReLU if the channel count changes,
    identity otherwise. For new branches: a chain of stride-2 3x3
    conv+BN+ReLU applied to the last input branch.

    `conv_only_on_existing` reproduces the HRFuser stage-2 quirk
    (`hrfuser_hrformer_based.py:553`: `self.transition1[i][0]`), where the
    camera transition for existing branches applies only the conv, skipping
    its BN+ReLU; for new branches only the first chain step runs (which is
    the whole chain whenever a single level is skipped).
    """
    in_channels: tuple
    out_channels: tuple
    conv_only_on_existing: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[Array], train: bool) -> List[Array]:
        pre = len(self.in_channels)
        out = []
        for i, oc in enumerate(self.out_channels):
            if i < pre:
                if oc != self.in_channels[i]:
                    if self.conv_only_on_existing:
                        y = nn.Conv(oc, (3, 3), padding=((1, 1), (1, 1)),
                                    use_bias=False, dtype=self.dtype,
                                    name=f'trans{i}_conv')(xs[-1])
                    else:
                        y = ConvNorm(oc, 3, 1, act=True, dtype=self.dtype,
                                     name=f'trans{i}')(xs[-1], train)
                    out.append(y)
                else:
                    out.append(xs[i])
            else:
                y = xs[-1]
                steps = i + 1 - pre
                steps = 1 if self.conv_only_on_existing else steps
                for j in range(steps):
                    last = j == (i - pre)
                    ch = oc if last or self.conv_only_on_existing \
                        else self.in_channels[-1]
                    y = ConvNorm(ch, 3, 2, act=True, dtype=self.dtype,
                                 name=f'trans{i}_step{j}')(y, train)
                out.append(y)
        return out


class FuseUp(nn.Module):
    """Fuse path j > i: 1x1 conv + BN, then upsample to the target size.

    HRNet conv modules upsample nearest (`hrnet.py:146`); HRFormer modules
    rely on the forward's bilinear interpolate (`hrnet.py:199-203`).
    """
    out_ch: int
    mode: str                                # 'nearest' | 'bilinear'
    factor: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, out_hw, train: bool) -> Array:
        x = ConvNorm(self.out_ch, 1, 1, act=False, dtype=self.dtype,
                     name='proj')(x, train)
        if self.mode == 'nearest':
            x = nearest_up(x, self.factor)
            if x.shape[1:3] != tuple(out_hw):
                x = bilinear_resize(x, out_hw)
        else:
            x = bilinear_resize(x, out_hw)
        return x


class FuseDownConv(nn.Module):
    """Fuse path j < i for conv modules: chain of stride-2 3x3 convs."""
    in_ch: int
    out_ch: int
    steps: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for k in range(self.steps):
            last = k == self.steps - 1
            ch = self.out_ch if last else self.in_ch
            x = ConvNorm(ch, 3, 2, act=not last, dtype=self.dtype,
                         name=f'step{k}')(x, train)
        return x


class FuseDownSep(nn.Module):
    """Fuse path j < i for HRFormer modules: depthwise-separable stride-2
    chain (`hrformer.py:524-557`)."""
    in_ch: int
    out_ch: int
    steps: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for k in range(self.steps):
            last = k == self.steps - 1
            ch = self.out_ch if last else self.in_ch
            x = ConvNorm(self.in_ch, 3, 2, groups=self.in_ch, act=False,
                         dtype=self.dtype, name=f'step{k}_dw')(x, train)
            x = ConvNorm(ch, 1, 1, act=False, dtype=self.dtype,
                         name=f'step{k}_pw')(x, train)
            if not last:
                x = nn.relu(x)
        return x


class HRModule(nn.Module):
    """One multi-resolution exchange module.

    Per-branch blocks (conv ResLayer or HRFormer transformer blocks), then
    the all-to-all fuse: up-paths 1x1+upsample, down-paths strided conv
    chains, summed and ReLU'd (`hrnet.py:184-207`).
    """
    stage: StageCfg
    in_channels: tuple
    multiscale_output: bool = True
    module_index: int = 0                    # for the drop-path schedule
    cf_layout: str = 'off'                   # 'off' | 'auto' | 'on'
    chain_kernel: str = 'off'                # 'off' | 'auto' | 'on'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[Array], train: bool) -> List[Array]:
        s = self.stage
        nb = s.num_branches
        assert len(xs) == nb, f'expected {nb} inputs, got {len(xs)}'
        is_former = s.block == 'HRFORMER'
        chain = (is_former and not self.is_initializing()
                 and resolve_chain(self.chain_kernel, train))

        # branches
        feats = []
        for i in range(nb):
            x = xs[i]
            from hrfuser_tpu.ops.pallas_chain import chain_fits
            bb, hh, ww, cc = x.shape
            if (is_former and chain
                    and chain_fits(hh, ww, cc,
                                   int(cc * s.mlp_ratios[i]),
                                   s.window_sizes[i],
                                   num_heads=s.num_heads[i])):
                from hrfuser_tpu.ops.pallas_chain import hrformer_chain
                nblk = s.num_blocks[i]
                v = self.variables
                blocks = [{'params': v['params'][f'branch{i}_block{j}'],
                           'batch_stats':
                               v['batch_stats'][f'branch{i}_block{j}']}
                          for j in range(nblk)]
                y = hrformer_chain(x.transpose(0, 3, 1, 2), blocks,
                                   num_heads=s.num_heads[i],
                                   window=s.window_sizes[i])
                x = y.transpose(0, 2, 3, 1)
            elif is_former:
                nblk = s.num_blocks[i]
                base = self.module_index * s.num_blocks[0]
                b, h, w, c = x.shape
                layout = resolve_layout(self.cf_layout, h, w, c)
                if layout == 'cf':
                    x = x.transpose(0, 3, 1, 2)          # NHWC -> [B,C,H,W]
                for j in range(nblk):
                    rates = s.drop_path_rates
                    dp = rates[base + j] if base + j < len(rates) else rates[-1]
                    x = HRFormerBlock(
                        num_heads=s.num_heads[i],
                        window_size=s.window_sizes[i],
                        mlp_ratio=s.mlp_ratios[i],
                        drop_path=dp, layout=layout,
                        dtype=self.dtype,
                        name=f'branch{i}_block{j}')(x, train)
                if layout == 'cf':
                    x = x.transpose(0, 2, 3, 1)          # back to NHWC
            else:
                x = ResLayer(s.block, s.num_channels[i], s.num_blocks[i],
                             self.in_channels[i], dtype=self.dtype,
                             name=f'branch{i}')(x, train)
            feats.append(x)

        if nb == 1:
            return feats

        # fuse
        out_ch = s.out_channels
        n_out = nb if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            y = feats[i]
            for j in range(nb):
                if j == i:
                    continue
                if j > i:
                    mode = 'bilinear' if is_former else 'nearest'
                    y = y + FuseUp(out_ch[i], mode, 2 ** (j - i),
                                   dtype=self.dtype,
                                   name=f'fuse{i}_{j}')(
                        feats[j], feats[i].shape[1:3], train)
                else:
                    down_cls = FuseDownSep if is_former else FuseDownConv
                    y = y + down_cls(out_ch[j], out_ch[i], i - j,
                                     dtype=self.dtype,
                                     name=f'fuse{i}_{j}')(feats[j], train)
            fused.append(nn.relu(y))
        return fused


class HRStage(nn.Module):
    """`num_modules` HRModules in sequence (`HRNet._make_stage`)."""
    stage: StageCfg
    in_channels: tuple
    multiscale_output: bool = True
    remat: bool = False
    cf_layout: str = 'off'                   # 'off' | 'auto' | 'on'
    chain_kernel: str = 'off'                # 'off' | 'auto' | 'on'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[Array], train: bool) -> List[Array]:
        s = self.stage
        chans = self.in_channels
        # remat: recompute each module's activations in backward
        # (jax.checkpoint; arg 0 is the module, so `train` is index 2)
        mod_cls = (nn.remat(HRModule, static_argnums=(2,)) if self.remat
                   else HRModule)
        for m in range(s.num_modules):
            ms_out = self.multiscale_output or m < s.num_modules - 1
            xs = mod_cls(s, chans, ms_out, module_index=m,
                         cf_layout=self.cf_layout,
                         chain_kernel=self.chain_kernel, dtype=self.dtype,
                         name=f'module{m}')(xs, train)
            chans = s.out_channels
        return xs
