"""Training-target computation for RPN and cascade RCNN stages, in-jit.

Rebuild of `AnchorHead.get_targets` (`mmdet/models/dense_heads/
anchor_head.py:299-452`) and `BBoxHead.get_targets`/`bbox_target`
(`mmdet/models/roi_heads/bbox_heads/bbox_head.py`), with the reference's
sampling pipeline (assign -> random-sample -> encode) re-expressed over
fixed-size arrays + weight masks. All functions operate on ONE image and
are vmapped by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hrfuser_tpu.core.assigners import max_iou_assign
from hrfuser_tpu.core.samplers import random_sample, select_fixed
from hrfuser_tpu.ops.boxes import bbox2delta

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AssignSampleCfg:
    pos_iou_thr: float
    neg_iou_thr: float
    min_pos_iou: float
    match_low_quality: bool
    num: int
    pos_fraction: float
    add_gt_as_proposals: bool


RPN_TRAIN_CFG = AssignSampleCfg(0.7, 0.3, 0.3, True, 256, 0.5, False)
RCNN_TRAIN_CFGS = (
    AssignSampleCfg(0.5, 0.5, 0.5, False, 512, 0.25, True),
    AssignSampleCfg(0.6, 0.6, 0.6, False, 512, 0.25, True),
    AssignSampleCfg(0.7, 0.7, 0.7, False, 512, 0.25, True),
)


class RPNTargets(NamedTuple):
    cls_targets: Array     # [N] float (1 = object)
    cls_weights: Array     # [N]
    bbox_targets: Array    # [N, 4]
    bbox_weights: Array    # [N, 4]
    num_samples: Array     # scalar (pos + neg), the loss avg factor share


def rpn_targets_single(rng: Array, anchors: Array, valid_flags: Array,
                       gt_boxes: Array, gt_valid: Array,
                       img_shape, allowed_border: float = 0.0,
                       cfg: AssignSampleCfg = RPN_TRAIN_CFG) -> RPNTargets:
    """Anchor targets for one image.

    `allowed_border=0` (HRFuser train cfg) keeps only anchors fully inside
    the image (`anchor_inside_flags`, `anchor_head.py:171`).
    """
    h, w = img_shape
    inside = (valid_flags
              & (anchors[:, 0] >= -allowed_border)
              & (anchors[:, 1] >= -allowed_border)
              & (anchors[:, 2] <= w + allowed_border)
              & (anchors[:, 3] <= h + allowed_border))

    gt_labels_dummy = jnp.zeros(gt_boxes.shape[0], jnp.int32)
    assign = max_iou_assign(gt_boxes, gt_labels_dummy, gt_valid,
                            anchors, inside,
                            cfg.pos_iou_thr, cfg.neg_iou_thr,
                            cfg.min_pos_iou, cfg.match_low_quality)

    sample = random_sample(rng, assign.gt_inds > 0, assign.gt_inds == 0,
                           cfg.num, cfg.pos_fraction)

    cls_targets = (assign.gt_inds > 0).astype(jnp.float32)
    cls_weights = (sample.pos_mask | sample.neg_mask).astype(jnp.float32)

    safe_gt = jnp.clip(assign.gt_inds - 1, 0, gt_boxes.shape[0] - 1)
    matched_gt = gt_boxes[safe_gt]
    bbox_targets = bbox2delta(anchors, matched_gt)
    bbox_weights = sample.pos_mask.astype(jnp.float32)[:, None] * \
        jnp.ones((1, 4), jnp.float32)
    bbox_targets = jnp.where(sample.pos_mask[:, None], bbox_targets, 0.0)

    return RPNTargets(cls_targets, cls_weights, bbox_targets, bbox_weights,
                      (sample.num_pos + sample.num_neg).astype(jnp.float32))


class RCNNStageTargets(NamedTuple):
    rois: Array            # [S, 4] sampled boxes
    labels: Array          # [S] int32 (num_classes = background)
    label_weights: Array   # [S]
    bbox_targets: Array    # [S, 4]
    bbox_weights: Array    # [S, 4]
    is_gt: Array           # [S] bool, roi was an appended gt box
    valid: Array           # [S] bool
    num_pos: Array


def rcnn_stage_targets_single(rng: Array, proposals: Array,
                              prop_valid: Array, gt_boxes: Array,
                              gt_labels: Array, gt_valid: Array,
                              num_classes: int,
                              stds: Tuple[float, ...],
                              cfg: AssignSampleCfg) -> RCNNStageTargets:
    """Assign + sample + encode for one cascade stage, one image.

    Sampling candidates are `[gt_boxes; proposals]` with gts pre-assigned
    to themselves (`BaseSampler.sample` with `add_gt_as_proposals=True`,
    gts prepended).
    """
    g = gt_boxes.shape[0]
    assign = max_iou_assign(gt_boxes, gt_labels, gt_valid,
                            proposals, prop_valid,
                            cfg.pos_iou_thr, cfg.neg_iou_thr,
                            cfg.min_pos_iou, cfg.match_low_quality)

    if cfg.add_gt_as_proposals:
        cand_boxes = jnp.concatenate([gt_boxes, proposals], axis=0)
        gt_self = jnp.where(gt_valid, jnp.arange(1, g + 1, dtype=jnp.int32),
                            -1)
        gt_inds = jnp.concatenate([gt_self, assign.gt_inds])
        is_gt_row = jnp.concatenate([gt_valid,
                                     jnp.zeros_like(prop_valid)])
    else:
        cand_boxes = proposals
        gt_inds = assign.gt_inds
        is_gt_row = jnp.zeros_like(prop_valid)

    sample = random_sample(rng, gt_inds > 0, gt_inds == 0,
                           cfg.num, cfg.pos_fraction)
    idx, is_pos, valid = select_fixed(sample, cfg.num)

    rois = cand_boxes[idx]
    sel_gt_inds = gt_inds[idx]
    safe_gt = jnp.clip(sel_gt_inds - 1, 0, g - 1)
    matched_gt = gt_boxes[safe_gt]
    matched_labels = gt_labels[safe_gt].astype(jnp.int32)

    labels = jnp.where(is_pos, matched_labels, num_classes)
    label_weights = valid.astype(jnp.float32)
    bbox_targets = bbox2delta(rois, matched_gt, stds=stds)
    bbox_targets = jnp.where(is_pos[:, None], bbox_targets, 0.0)
    bbox_weights = is_pos.astype(jnp.float32)[:, None] * \
        jnp.ones((1, 4), jnp.float32)

    return RCNNStageTargets(rois, labels, label_weights, bbox_targets,
                            bbox_weights, is_gt_row[idx] & valid, valid,
                            sample.num_pos.astype(jnp.float32))
