"""HRFuser multi-modal fusion backbone.

Rebuild of `HRFuserHRFormerBased` (`mmdet/models/backbones/
hrfuser_hrformer_based.py:331-628`) and, via config block types,
`HRFuserHRNetBased` (`hrfuser_hrnet_based.py:24-314`).

Topology (forward at reference `:522-628`): the camera follows the
HRFormer trunk; each extra modality gets its own stem + Bottleneck
stage A, then stays a single stride-4 branch through HRFormer stages
B/C (/D). Before every camera stage, each modality is transitioned to
every camera branch's stride/width and fused into the camera feature by
an MWCA `HRFuserFusionBlock`. Modality stages consume the *branch-0*
transitioned feature (`:565,586,612`).

Quirk preserved: the stage-2 camera transition applies only its conv for
existing branches (`transition1[i][0]`, `:553`) — see
`Transition.conv_only_on_existing`.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.attention import HRFuserFusionBlock, resolve_layout
from hrfuser_tpu.layers.common import ConvNorm, ResLayer
from hrfuser_tpu.models.backbones.hr_config import (FusionCfg, HRBackboneCfg,
                                                    StageCfg)
from hrfuser_tpu.models.backbones.hr_modules import HRStage, Transition
from hrfuser_tpu.models.backbones.hrformer import Stem

Array = jnp.ndarray
Dtype = Any


class FusionBank(nn.Module):
    """One `HRFuserFusionBlock` per camera branch (`_make_multimodal_fusion`)."""
    fusion: FusionCfg
    num_modalities: int
    remat: bool = False
    cf_layout: str = 'off'                   # 'off' | 'auto' | 'on'
    chain_kernel: str = 'off'                # 'off' | 'auto' | 'on'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: List[Array], mods: List[List[Array]],
                 train: bool) -> List[Array]:
        from hrfuser_tpu.ops.pallas_chain import resolve_chain
        f = self.fusion
        from hrfuser_tpu.ops.pallas_chain import chain_fits
        chain = (not self.is_initializing()
                 and resolve_chain(self.chain_kernel, train))
        if chain:
            from hrfuser_tpu.ops.pallas_chain import fusion_chain
            v = self.variables
            out = []
            fits = all(
                chain_fits(xs[i].shape[1], xs[i].shape[2], xs[i].shape[3],
                           int(xs[i].shape[3] * f.mlp_ratios[i]),
                           f.window_sizes[i], num_heads=f.num_heads[i])
                for i in range(f.num_branches))
            if fits:
                for i in range(f.num_branches):
                    blk = {'params': v['params'][f'branch{i}'],
                           'batch_stats': v['batch_stats'][f'branch{i}']}
                    y = fusion_chain(
                        xs[i].transpose(0, 3, 1, 2),
                        [z.transpose(0, 3, 1, 2) for z in mods[i]], blk,
                        num_heads=f.num_heads[i],
                        window=f.window_sizes[i])
                    out.append(y.transpose(0, 2, 3, 1))
                return out
        blk_cls = (nn.remat(HRFuserFusionBlock, static_argnums=(3,))
                   if self.remat else HRFuserFusionBlock)
        out = []
        for i in range(f.num_branches):
            x, ms = xs[i], mods[i]
            b, h, w, c = x.shape
            layout = resolve_layout(self.cf_layout, h, w, c)
            if layout == 'cf':
                x = x.transpose(0, 3, 1, 2)
                ms = [m.transpose(0, 3, 1, 2) for m in ms]
            y = blk_cls(
                num_heads=f.num_heads[i],
                num_modalities=self.num_modalities,
                window_size=f.window_sizes[i],
                mlp_ratio=f.mlp_ratios[i],
                drop_path=f.drop_path,
                proj_drop=f.proj_drop_rate,
                layout=layout,
                dtype=self.dtype,
                name=f'branch{i}')(x, ms, train)
            if layout == 'cf':
                y = y.transpose(0, 2, 3, 1)
            out.append(y)
        return out


class ModalityStage(nn.Module):
    """Single-branch stage run independently per modality (`_make_mod_stage`).

    Chain-kernel fast path (eval, TPU): a single-branch HRFORMER stage
    is a pure block chain (no fuse layers), so ALL its modules' blocks
    across ALL modalities run as ONE `hrformer_chain` call — modalities
    stacked on the kernel grid's stream axis with per-(stream, block)
    weights, the residual VMEM-resident across the whole stage.
    """
    stage: StageCfg
    num_modalities: int
    remat: bool = False
    cf_layout: str = 'off'                   # 'off' | 'auto' | 'on'
    chain_kernel: str = 'off'                # 'off' | 'auto' | 'on'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: List[Array], train: bool) -> List[Array]:
        from hrfuser_tpu.ops.pallas_chain import resolve_chain
        from hrfuser_tpu.ops.pallas_chain import chain_fits
        s = self.stage
        _, fh, fw, fc = feats[0].shape
        if (s.block == 'HRFORMER' and not self.is_initializing()
                and resolve_chain(self.chain_kernel, train)
                and chain_fits(fh, fw, fc, int(fc * s.mlp_ratios[0]),
                               s.window_sizes[0],
                               num_heads=s.num_heads[0])):
            from hrfuser_tpu.ops.pallas_chain import hrformer_chain
            v = self.variables
            blocks = []
            for k in range(self.num_modalities):
                for m in range(s.num_modules):
                    for j in range(s.num_blocks[0]):
                        sub = v['params'][f'mod{k}'][f'module{m}']
                        bsub = v['batch_stats'][f'mod{k}'][f'module{m}']
                        blocks.append(
                            {'params': sub[f'branch0_block{j}'],
                             'batch_stats': bsub[f'branch0_block{j}']})
            x = jnp.concatenate(feats, 0).transpose(0, 3, 1, 2)
            y = hrformer_chain(x, blocks, num_heads=s.num_heads[0],
                               window=s.window_sizes[0],
                               n_streams=self.num_modalities)
            y = y.transpose(0, 2, 3, 1)
            b = feats[0].shape[0]
            return [y[k * b:(k + 1) * b] for k in range(self.num_modalities)]
        out = []
        for k in range(self.num_modalities):
            y = HRStage(self.stage, self.stage.out_channels,
                        remat=self.remat, cf_layout=self.cf_layout,
                        chain_kernel=self.chain_kernel,
                        dtype=self.dtype, name=f'mod{k}')([feats[k]], train)
            out.append(y[0])
        return out


class ModalityTransition(nn.Module):
    """Per-modality `Transition` (`_make_mod_transition_layer`)."""
    in_channels: tuple                        # single-branch input channels
    out_channels: tuple
    num_modalities: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: List[Array], train: bool) -> List[List[Array]]:
        """Returns per-branch lists: out[i][k] = modality k at branch i."""
        per_mod = []
        for k in range(self.num_modalities):
            per_mod.append(Transition(self.in_channels, self.out_channels,
                                      dtype=self.dtype,
                                      name=f'mod{k}')([feats[k]], train))
        # transpose to [branch][modality]
        nb = len(self.out_channels)
        return [[per_mod[k][i] for k in range(self.num_modalities)]
                for i in range(nb)]


class HRFuserBackbone(nn.Module):
    cfg: HRBackboneCfg
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, x_mods: List[Array],
                 train: bool = False) -> List[Array]:
        cfg = self.cfg
        nm = cfg.num_fused_modalities
        assert len(x_mods) == nm, \
            f'expected {nm} modality inputs, got {len(x_mods)}'

        # camera stem + stage 1
        x = Stem(dtype=self.dtype, name='stem')(x, train)
        x = ResLayer(cfg.stage1.block, cfg.stage1.num_channels[0],
                     cfg.stage1.num_blocks[0], 64, dtype=self.dtype,
                     name='layer1')(x, train)

        # modality stems + stage A
        mods = []
        for k in range(nm):
            m = Stem(dtype=self.dtype, name=f'stem_mod{k}')(x_mods[k], train)
            m = ResLayer(cfg.stage_a.block, cfg.stage_a.num_channels[0],
                         cfg.stage_a.num_blocks[0], 64, dtype=self.dtype,
                         name=f'layer_a{k}')(m, train)
            mods.append(m)
        stage_a_out = (cfg.stage_a.out_channels[0],)

        # ---- stage 2 (+ fusion A, modality stage B) ----
        xs = Transition((cfg.stage1.out_channels[0],),
                        cfg.stage2.out_channels, conv_only_on_existing=True,
                        dtype=self.dtype, name='transition1')([x], train)
        m_br = ModalityTransition(stage_a_out, cfg.fusion_a.num_channels, nm,
                                  dtype=self.dtype,
                                  name='transition_a')(mods, train)
        xs = FusionBank(cfg.fusion_a, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout,
                        chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                        name='fusion_a')(xs, m_br, train)
        ys = HRStage(cfg.stage2, cfg.stage2.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                     name='stage2')(xs, train)
        mods = ModalityStage(cfg.stage_b, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout,
                        chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                             name='stage_b')(m_br[0], train)

        # ---- stage 3 (+ fusion B, modality stage C) ----
        xs = Transition(cfg.stage2.out_channels, cfg.stage3.out_channels,
                        dtype=self.dtype, name='transition2')(ys, train)
        m_br = ModalityTransition(cfg.stage_b.out_channels,
                                  cfg.fusion_b.num_channels, nm,
                                  dtype=self.dtype,
                                  name='transition_b')(mods, train)
        xs = FusionBank(cfg.fusion_b, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout,
                        chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                        name='fusion_b')(xs, m_br, train)
        ys = HRStage(cfg.stage3, cfg.stage3.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                     name='stage3')(xs, train)
        mods = ModalityStage(cfg.stage_c, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout,
                        chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                             name='stage_c')(m_br[0], train)

        # ---- stage 4 (+ fusion C) ----
        xs = Transition(cfg.stage3.out_channels, cfg.stage4.out_channels,
                        dtype=self.dtype, name='transition3')(ys, train)
        m_br = ModalityTransition(cfg.stage_c.out_channels,
                                  cfg.fusion_c.num_channels, nm,
                                  dtype=self.dtype,
                                  name='transition_c')(mods, train)
        xs = FusionBank(cfg.fusion_c, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout,
                        chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                        name='fusion_c')(xs, m_br, train)
        ys = HRStage(cfg.stage4, cfg.stage4.out_channels, remat=cfg.remat,
                     cf_layout=cfg.cf_layout,
                     chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                     name='stage4')(xs, train)

        # ---- optional modality stage D + pre-neck fusion ----
        if cfg.pre_neck_fusion:
            mods = ModalityStage(cfg.stage_d, nm, remat=cfg.remat,
                        cf_layout=cfg.cf_layout, dtype=self.dtype,
                                 name='stage_d')(m_br[0], train)
            m_br = ModalityTransition(cfg.stage_d.out_channels,
                                      cfg.fusion_d.num_channels, nm,
                                      dtype=self.dtype,
                                      name='transition_d')(mods, train)
            xs = FusionBank(cfg.fusion_d, nm, remat=cfg.remat,
                            cf_layout=cfg.cf_layout,
                            chain_kernel=cfg.chain_kernel, dtype=self.dtype,
                            name='fusion_d')(ys, m_br, train)
            ys = [nn.relu(v) for v in xs]
        return ys
