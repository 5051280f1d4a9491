"""Model/experiment presets mirroring the reference config surface.

Every leaf config under the reference's `configs/hrfuser/` and
`configs/hrformer/` (names preserved — they are the public API per
BASELINE.json) is expressed here as a composition of preset builders
instead of layered dicts. `_bn` variants are aliases: on TPU plain BN
under a batch-sharded `jit` already computes global statistics, so the
SyncBN/BN distinction disappears by construction (SURVEY §2.7).

Sources: `configs/_base_/models/cascade_rcnn_hrfuser_fpn_nus_clr_fusion.py`
(+ stf variant), `configs/hrfuser/*.py`, `configs/hrformer/*.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from hrfuser_tpu.models.backbones.hr_config import (FusionCfg, HRBackboneCfg,
                                                    StageCfg,
                                                    apply_stochastic_depth)
from hrfuser_tpu.models.detectors.cascade_rcnn import (DetectorCfg,
                                                       RPNTestCfg)
from hrfuser_tpu.models.roi_heads.cascade_roi_head import RoIHeadCfg

NUSCENES_CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
                    'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
                    'barrier')
STF_CLASSES = ('Pedestrian', 'Cyclist', 'Car')

# Per-sensor normalization (nuScenes dataset config).
NUS_IMG_NORM = dict(mean=(123.675, 116.28, 103.53),
                    std=(58.395, 57.12, 57.375), to_rgb=True)
NUS_LIDAR_NORM = dict(mean=(0.23277158, 0.31501067, -0.00012928071),
                      std=(2.5538357826888602, 3.7345728854535643,
                           0.2815488539921788), to_rgb=False)
NUS_RADAR_NORM = dict(mean=(0.19778967, 0.03477772, 0.0025186215),
                      std=(3.219927182957935, 0.7240392925308506,
                           0.11561270078715341), to_rgb=False)


@dataclasses.dataclass(frozen=True)
class OptimCfg:
    lr: float = 3e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    # parameter-name substrings excluded from weight decay (the reference
    # decays biases of conv/fc, so 'bias' is NOT excluded; custom_keys at
    # `cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion.py:43-48`)
    no_decay_keys: Tuple[str, ...] = ('relative_position_bias_table', 'norm',
                                     'bn')


@dataclasses.dataclass(frozen=True)
class ScheduleCfg:
    max_epochs: int = 12
    lr_steps: Tuple[int, ...] = (8, 11)
    warmup_iters: int = 500
    warmup_ratio: float = 1e-3
    samples_per_device: int = 3


@dataclasses.dataclass(frozen=True)
class DataCfg:
    dataset: str                             # 'nuscenes' | 'stf'
    classes: Tuple[str, ...]
    img_scale: Tuple[int, int]               # (w, h) target resize
    pad_divisor: int = 32
    modalities: Tuple[str, ...] = ()         # ordered extra streams
    modality_drop_p: Tuple[float, ...] = ()
    flip_ratio: float = 0.5
    # STF-only deterministic crops: ((h, w, off_h, off_w), ...)
    crops: Tuple[Tuple[int, int, int, int], ...] = ()
    eval_on_crop: Optional[Tuple[int, int, int, int]] = None
    # restrict metric computation to a label subset (reference
    # `evaluation_ids`, `mmdet/datasets/coco.py:485-486`); None = all
    evaluation_class_ids: Optional[Tuple[int, ...]] = None


@dataclasses.dataclass(frozen=True)
class ExperimentCfg:
    name: str
    model: DetectorCfg
    data: DataCfg
    schedule: ScheduleCfg
    optim: OptimCfg
    seed: int = 0


def _hrformer_stages(channels: Tuple[int, ...], heads: Tuple[int, ...],
                     stage3_modules: int) -> Dict[str, StageCfg]:
    """Camera trunk stages shared by all configs (window 7, mlp ratio 4)."""
    def stage(n, nm):
        return StageCfg(num_modules=nm, num_branches=n, block='HRFORMER',
                        num_blocks=(2,) * n, num_channels=channels[:n],
                        num_heads=heads[:n], window_sizes=(7,) * n,
                        mlp_ratios=(4,) * n)
    return dict(
        stage1=StageCfg(1, 1, 'BOTTLENECK', (2,), (64,)),
        stage2=stage(2, 1),
        stage3=stage(3, stage3_modules),
        stage4=stage(4, 2),
    )


def hrformer_backbone(channels=(18, 36, 72, 144), heads=(1, 2, 4, 8),
                      stage3_modules=3, drop_path_rate=0.0) -> HRBackboneCfg:
    cfg = HRBackboneCfg(drop_path_rate=drop_path_rate,
                        **_hrformer_stages(channels, heads, stage3_modules))
    return apply_stochastic_depth(cfg)


def hrfuser_backbone(channels=(18, 36, 72, 144), heads=(1, 2, 4, 8),
                     stage3_modules=3, lidar_c_modules=3,
                     num_modalities=2, mod_in_channels=(3, 3),
                     drop_path_rate=0.0, fusion_drop_path=0.2,
                     proj_drop_rate=0.1) -> HRBackboneCfg:
    stages = _hrformer_stages(channels, heads, stage3_modules)

    def mod_stage(nm):
        return StageCfg(num_modules=nm, num_branches=1, block='HRFORMER',
                        num_blocks=(2,), num_channels=(channels[0],),
                        num_heads=(heads[0],), window_sizes=(7,),
                        mlp_ratios=(4,))

    def fusion(n):
        return FusionCfg(num_branches=n, num_channels=channels[:n],
                         num_heads=heads[:n], window_sizes=(7,) * n,
                         mlp_ratios=(4,) * n, drop_path=fusion_drop_path,
                         proj_drop_rate=proj_drop_rate)

    cfg = HRBackboneCfg(
        stage_a=StageCfg(1, 1, 'BOTTLENECK', (2,), (64,)),
        stage_b=mod_stage(1),
        stage_c=mod_stage(lidar_c_modules),
        fusion_a=fusion(2), fusion_b=fusion(3), fusion_c=fusion(4),
        num_fused_modalities=num_modalities,
        mod_in_channels=tuple(mod_in_channels),
        drop_path_rate=drop_path_rate,
        **stages)
    return apply_stochastic_depth(cfg)


def hrfuser_hrnet_backbone(channels=(18, 36, 72, 144), heads=(1, 2, 4, 8),
                           num_modalities=2, mod_in_channels=(3, 3),
                           blocks_per_branch=4,
                           stage_modules=(1, 4, 3),
                           fusion_drop_path=0.2,
                           proj_drop_rate=0.1) -> HRBackboneCfg:
    """HRNet-based HRFuser: BASIC-block conv trunk + MWCA fusion banks.

    Rebuild of `HRFuserHRNetBased`
    (`mmdet/models/backbones/hrfuser_hrnet_based.py:24-314`): the camera
    trunk and modality streams are plain HRNet (BASIC residual blocks,
    nearest-upsample conv fuse), while the fusion blocks are the same
    transformer MWCA banks as the HRFormer-based variant. Defaults are
    the HRNet-W18 stage table (`configs/_base_/models/...hrnet` family).
    """
    def cam_stage(n_br, nm):
        return StageCfg(num_modules=nm, num_branches=n_br, block='BASIC',
                        num_blocks=(blocks_per_branch,) * n_br,
                        num_channels=channels[:n_br])

    def mod_stage(nm):
        return StageCfg(num_modules=nm, num_branches=1, block='BASIC',
                        num_blocks=(blocks_per_branch,),
                        num_channels=(channels[0],))

    def fusion(n):
        return FusionCfg(num_branches=n, num_channels=channels[:n],
                         num_heads=heads[:n], window_sizes=(7,) * n,
                         mlp_ratios=(4,) * n, drop_path=fusion_drop_path,
                         proj_drop_rate=proj_drop_rate)

    return HRBackboneCfg(
        stage1=StageCfg(1, 1, 'BOTTLENECK', (4,), (64,)),
        stage2=cam_stage(2, stage_modules[0]),
        stage3=cam_stage(3, stage_modules[1]),
        stage4=cam_stage(4, stage_modules[2]),
        stage_a=StageCfg(1, 1, 'BOTTLENECK', (4,), (64,)),
        stage_b=mod_stage(1), stage_c=mod_stage(1),
        fusion_a=fusion(2), fusion_b=fusion(3), fusion_c=fusion(4),
        num_fused_modalities=num_modalities,
        mod_in_channels=tuple(mod_in_channels))


def detector(backbone: HRBackboneCfg, num_classes: int) -> DetectorCfg:
    return DetectorCfg(backbone=backbone,
                       roi=RoIHeadCfg(num_classes=num_classes),
                       rpn_test=RPNTestCfg())


def _nus_data(modalities=('lidar', 'radar')) -> DataCfg:
    return DataCfg(dataset='nuscenes', classes=NUSCENES_CLASSES,
                   img_scale=(640, 360),
                   modalities=tuple(modalities),
                   modality_drop_p=(0.2,) * (len(modalities) + 1)
                   if modalities else ())


def _stf_data(modalities=('lidar', 'radar', 'gated')) -> DataCfg:
    # Crop(768,1280)@(202,280) -> Resize -> Crop(384,1248)@(192,16);
    # eval GT crop (384,1248)@(394,296) (`kitti_detection_2d_c1248_*`).
    return DataCfg(dataset='stf', classes=STF_CLASSES,
                   img_scale=(1248, 384),
                   modalities=tuple(modalities),
                   modality_drop_p=(0.5,) * (len(modalities) + 1)
                   if modalities else (),
                   crops=((768, 1280, 202, 280), (384, 1248, 192, 16)),
                   eval_on_crop=(384, 1248, 394, 296))


_REGISTRY: Dict[str, Callable[[], ExperimentCfg]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        _REGISTRY[name + '_bn'] = fn        # BN alias (see module docstring)
        return fn
    return deco


def get_config(name: str) -> ExperimentCfg:
    if name.endswith('.py'):
        name = name.rsplit('/', 1)[-1][:-3]
    if name not in _REGISTRY:
        raise KeyError(f'unknown config {name!r}; known: '
                       f'{sorted(_REGISTRY)}')
    cfg = _REGISTRY[name]()
    return dataclasses.replace(cfg, name=name)


def list_configs():
    return sorted(_REGISTRY)


@register('tiny_fusion_test')
def _tiny_fusion() -> ExperimentCfg:
    """Miniature fusion model for fast unit tests (not a reference config)."""
    model = detector(hrfuser_backbone(channels=(8, 16, 24, 32),
                                      heads=(1, 2, 2, 4)), num_classes=4)
    model = dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=4,
                                fc_out_channels=64, max_per_img=20),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=200,
                                     max_per_img=100),
        neck_out_channels=32)
    return ExperimentCfg(
        name='tiny_fusion_test', model=model, data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=2), optim=OptimCfg())


@register('micro_fusion_dryrun')
def _micro_fusion() -> ExperimentCfg:
    """Smallest-possible fusion model exercising every train-step code
    path (2 modalities, MWCA fusion at every stage, 3-stage cascade) —
    built for the multichip dry run, where the whole sharded train step
    must COMPILE on a 1-core CPU host inside the driver's timeout.
    One module of one block per stage; not a reference config."""
    ch = (8, 16, 24, 32)
    heads = (1, 1, 1, 1)

    def cam_stage(n_br):
        return StageCfg(num_modules=1, num_branches=n_br, block='HRFORMER',
                        num_blocks=(1,) * n_br, num_channels=ch[:n_br],
                        num_heads=heads[:n_br], window_sizes=(7,) * n_br,
                        mlp_ratios=(2,) * n_br)

    def mod_stage():
        return StageCfg(num_modules=1, num_branches=1, block='HRFORMER',
                        num_blocks=(1,), num_channels=(ch[0],),
                        num_heads=(1,), window_sizes=(7,), mlp_ratios=(2,))

    def fusion(n):
        return FusionCfg(num_branches=n, num_channels=ch[:n],
                         num_heads=heads[:n], window_sizes=(7,) * n,
                         mlp_ratios=(2,) * n)

    backbone = HRBackboneCfg(
        stage1=StageCfg(1, 1, 'BOTTLENECK', (1,), (16,)),
        stage2=cam_stage(2), stage3=cam_stage(3), stage4=cam_stage(4),
        stage_a=StageCfg(1, 1, 'BOTTLENECK', (1,), (16,)),
        stage_b=mod_stage(), stage_c=mod_stage(),
        fusion_a=fusion(2), fusion_b=fusion(3), fusion_c=fusion(4),
        num_fused_modalities=2, mod_in_channels=(3, 3))
    model = detector(backbone, num_classes=4)
    model = dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=4,
                                fc_out_channels=32, max_per_img=8),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=64,
                                     max_per_img=32),
        neck_out_channels=32)
    return ExperimentCfg(
        name='micro_fusion_dryrun', model=model, data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=1), optim=OptimCfg())


@register('tiny_camera_test')
def _tiny_camera() -> ExperimentCfg:
    """Miniature camera-only model for fast unit tests."""
    model = detector(hrformer_backbone(channels=(8, 16, 24, 32),
                                       heads=(1, 2, 2, 4)), num_classes=4)
    model = dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=4,
                                fc_out_channels=64, max_per_img=20),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=200,
                                     max_per_img=100),
        neck_out_channels=32)
    return ExperimentCfg(
        name='tiny_camera_test', model=model,
        data=_nus_data(modalities=()),
        schedule=ScheduleCfg(samples_per_device=2), optim=OptimCfg())


@register('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
def _hrfuser_t_nus() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion',
        model=detector(hrfuser_backbone(), num_classes=10),
        data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=3),
        optim=OptimCfg(lr=3e-4))


@register('cascade_rcnn_hrfuser_hrnet_w18_1x_nus_r640_l_r_fusion')
def _hrfuser_hrnet_nus() -> ExperimentCfg:
    """HRNet-based fusion variant (latent in the reference: the
    `HRFuserHRNetBased` backbone ships without a leaf config)."""
    return ExperimentCfg(
        name='cascade_rcnn_hrfuser_hrnet_w18_1x_nus_r640_l_r_fusion',
        model=detector(hrfuser_hrnet_backbone(), num_classes=10),
        data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=3),
        optim=OptimCfg(lr=3e-4))


@register('tiny_hrnet_fusion_test')
def _tiny_hrnet_fusion() -> ExperimentCfg:
    """Miniature HRNet-based fusion model for unit tests."""
    model = detector(hrfuser_hrnet_backbone(channels=(8, 16, 24, 32),
                                            heads=(1, 2, 2, 4),
                                            blocks_per_branch=1,
                                            stage_modules=(1, 1, 1)),
                     num_classes=4)
    model = dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=4,
                                fc_out_channels=64, max_per_img=20),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=200,
                                     max_per_img=100),
        neck_out_channels=32)
    return ExperimentCfg(
        name='tiny_hrnet_fusion_test', model=model, data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=2), optim=OptimCfg())


@register('cascade_rcnn_hrfuser_b_1x_nus_r640_l_r_fusion')
def _hrfuser_b_nus() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrfuser_b_1x_nus_r640_l_r_fusion',
        model=detector(hrfuser_backbone(
            channels=(78, 156, 312, 624), heads=(2, 4, 8, 16),
            stage3_modules=4, lidar_c_modules=4, drop_path_rate=0.4),
            num_classes=10),
        data=_nus_data(),
        schedule=ScheduleCfg(samples_per_device=2),
        optim=OptimCfg(lr=3e-4))


@register('cascade_rcnn_hrfuser_t_1x_stf_r1248_4mod')
def _hrfuser_t_stf() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrfuser_t_1x_stf_r1248_4mod',
        model=detector(hrfuser_backbone(
            num_modalities=3, mod_in_channels=(3, 2, 1)), num_classes=3),
        data=_stf_data(),
        schedule=ScheduleCfg(max_epochs=60, lr_steps=(40, 50),
                             samples_per_device=3),
        optim=OptimCfg(lr=1e-3))


@register('cascade_rcnn_hrformer_t_1x_nus_r640')
def _hrformer_t_nus() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrformer_t_1x_nus_r640',
        model=detector(hrformer_backbone(), num_classes=10),
        data=_nus_data(modalities=()),
        schedule=ScheduleCfg(samples_per_device=6),
        optim=OptimCfg(lr=1e-3))


@register('cascade_rcnn_hrformer_b_1x_nus_r640')
def _hrformer_b_nus() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrformer_b_1x_nus_r640',
        model=detector(hrformer_backbone(
            channels=(78, 156, 312, 624), heads=(2, 4, 8, 16),
            stage3_modules=4, drop_path_rate=0.4), num_classes=10),
        data=_nus_data(modalities=()),
        schedule=ScheduleCfg(samples_per_device=2),
        optim=OptimCfg(lr=1e-3))


@register('cascade_rcnn_hrformer_t_1x_stf_c1248')
def _hrformer_t_stf() -> ExperimentCfg:
    return ExperimentCfg(
        name='cascade_rcnn_hrformer_t_1x_stf_c1248',
        model=detector(hrformer_backbone(), num_classes=3),
        data=_stf_data(modalities=()),
        schedule=ScheduleCfg(max_epochs=60, lr_steps=(40, 50),
                             samples_per_device=3),
        optim=OptimCfg(lr=1e-3))
