"""Cascade R-CNN detector: backbone + HRFPN + RPN + cascade RoI head.

Rebuild of the reference `CascadeRCNN` / `TwoStageDetector`
(`mmdet/models/detectors/two_stage.py`, `cascade_rcnn.py`): multimodal
inputs enter through the backbone (`extract_feat(img, mod_imgs)`,
`two_stage.py:76-84`), proposals come from the RPN, detections from the
cascade head. Inference is fully statically shaped and jit-friendly;
batching of the per-image RPN-decode/RoI path happens via `jax.vmap` in
`predict` below.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.models.backbones.hr_config import HRBackboneCfg
from hrfuser_tpu.models.backbones.hrformer import HRFormerBackbone
from hrfuser_tpu.models.backbones.hrfuser import HRFuserBackbone
from hrfuser_tpu.models.dense_heads.rpn_head import (Proposals, RPNHead,
                                                     get_proposals_single)
from hrfuser_tpu.models.necks.hrfpn import HRFPN
from hrfuser_tpu.models.roi_heads.cascade_roi_head import (CascadeRoIHead,
                                                           Detections,
                                                           RoIHeadCfg)
from hrfuser_tpu.ops.anchors import AnchorGenerator

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RPNTestCfg:
    nms_pre: int = 1000
    max_per_img: int = 1000
    nms_iou: float = 0.7
    min_bbox_size: float = 0.0


@dataclasses.dataclass(frozen=True)
class DetectorCfg:
    backbone: HRBackboneCfg
    roi: RoIHeadCfg
    rpn_test: RPNTestCfg = RPNTestCfg()
    neck_out_channels: int = 256
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scales: Tuple[float, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)

    @property
    def is_fusion(self) -> bool:
        return self.backbone.num_fused_modalities > 0

    def anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=list(self.anchor_strides),
                               ratios=list(self.anchor_ratios),
                               scales=list(self.anchor_scales))


class CascadeRCNN(nn.Module):
    cfg: DetectorCfg
    dtype: Optional[Any] = None

    def setup(self):
        if self.cfg.is_fusion:
            self.backbone = HRFuserBackbone(self.cfg.backbone,
                                            dtype=self.dtype)
        else:
            self.backbone = HRFormerBackbone(self.cfg.backbone,
                                             dtype=self.dtype)
        self.neck = HRFPN(out_channels=self.cfg.neck_out_channels,
                          dtype=self.dtype)
        num_anchors = (len(self.cfg.anchor_ratios)
                       * len(self.cfg.anchor_scales))
        self.rpn_head = RPNHead(feat_channels=self.cfg.neck_out_channels,
                                num_anchors=num_anchors, dtype=self.dtype)
        self.roi_head = CascadeRoIHead(self.cfg.roi, dtype=self.dtype)

    def extract_feat(self, img: Array, mod_imgs: Optional[List[Array]] = None,
                     train: bool = False) -> List[Array]:
        """Backbone + neck -> 5 pyramid levels [B, H_l, W_l, C]."""
        if self.cfg.is_fusion:
            assert mod_imgs is not None
            feats = self.backbone(img, list(mod_imgs), train)
        else:
            feats = self.backbone(img, train)
        return self.neck(feats, train)

    def rpn(self, feats: List[Array]):
        return self.rpn_head(feats)

    def forward_features(self, img: Array,
                         mod_imgs: Optional[List[Array]] = None,
                         train: bool = False):
        """Feats + RPN outputs (the batched part of the forward pass)."""
        feats = self.extract_feat(img, mod_imgs, train)
        cls_scores, bbox_preds = self.rpn_head(feats)
        return feats, cls_scores, bbox_preds

    def roi_forward(self, stage: int, feats: Sequence[Array],
                    rois: Array):
        """Single-image, single-stage RoI forward (used in training)."""
        return self.roi_head.forward_stage(stage, feats, rois)

    def roi_test(self, feats: Sequence[Array], proposals: Array,
                 proposal_valid: Array, img_shape, scale_factor,
                 rescale: bool = True) -> Detections:
        """Single-image cascade test (vmapped by `predict`)."""
        return self.roi_head.simple_test(feats, proposals, proposal_valid,
                                         img_shape, scale_factor, rescale)

    def roi_decode(self, feats: Sequence[Array], proposals: Array,
                   proposal_valid: Array, img_shape):
        """Single-image cascade decode without NMS (aug_test merging)."""
        return self.roi_head.decode_cascade(feats, proposals,
                                            proposal_valid, img_shape)

    def __call__(self, img: Array, mod_imgs: Optional[List[Array]] = None,
                 train: bool = False):
        """Init-friendly forward touching every submodule."""
        feats, cls_scores, bbox_preds = self.forward_features(
            img, mod_imgs, train)
        b = img.shape[0]
        dummy_rois = jnp.tile(jnp.asarray([[0., 0., 32., 32.]]), (8, 1))
        logits, deltas = self.roi_head.forward_stage(
            0, [f[0] for f in feats[:4]], dummy_rois)
        for i in range(1, self.cfg.roi.num_stages):
            logits, deltas = self.roi_head.forward_stage(
                i, [f[0] for f in feats[:4]], dummy_rois)
        return feats, cls_scores, bbox_preds, logits, deltas


def predict(detector: CascadeRCNN, variables, img: Array,
            mod_imgs: Optional[List[Array]] = None,
            img_shapes: Optional[Array] = None,
            scale_factors: Optional[Array] = None,
            rescale: bool = True) -> Detections:
    """Batched end-to-end inference (jit this).

    Args:
        img: [B, H, W, 3] (padded to /32).
        mod_imgs: list of [B, H, W, C_mod] sensor images.
        img_shapes: [B, 2] (h, w) unpadded shapes for box clipping;
            defaults to the full padded shape.
        scale_factors: [B, 4] resize factors for rescaling to the original
            image; defaults to 1.

    Returns:
        `Detections` with a leading batch axis.
    """
    b, h, w, _ = img.shape
    if img_shapes is None:
        img_shapes = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    if scale_factors is None:
        scale_factors = jnp.ones((b, 4), jnp.float32)

    feats, cls_scores, bbox_preds = detector.apply(
        variables, img, mod_imgs, False, method='forward_features')

    cfg = detector.cfg
    gen = cfg.anchor_generator()
    featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
    anchors = [jnp.asarray(a) for a in gen.grid_anchors(featmap_sizes)]

    def per_image(feats_i, scores_i, preds_i, shape_i, sf_i):
        props = get_proposals_single(
            scores_i, preds_i, anchors, (shape_i[0], shape_i[1]),
            nms_pre=cfg.rpn_test.nms_pre,
            max_per_img=cfg.rpn_test.max_per_img,
            nms_iou=cfg.rpn_test.nms_iou,
            min_bbox_size=cfg.rpn_test.min_bbox_size)
        return detector.apply(variables, feats_i[:4], props.boxes,
                              props.valid, (shape_i[0], shape_i[1]), sf_i,
                              rescale, method='roi_test')

    return jax.vmap(per_image)(
        [f for f in feats], cls_scores, bbox_preds, img_shapes,
        scale_factors)
